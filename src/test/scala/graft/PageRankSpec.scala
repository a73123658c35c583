package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: hand-computed two-node chain, and mass bounds
  * on the registered graph. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("two-node chain converges to the hand-computed fixed point") {
    // a -> b, weight 1. n=2, Scale/n = 5e8, base = (5e8·15)/100 = 7.5e7.
    // Round 1: r_b = base + 85%·5e8 = 5e8; r_a = base.
    // Round 2+: r_b = base + 85%·base = 138,750,000 — the fixed point
    // (a's rank is base from round 1 on, so rounds 3–5 repeat round 2).
    val trans = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val nodes = Seq("a", "b").toDF("id")
    val got = PageRank.rank(trans, nodes).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("a") == ((75000000L, 1L, 0L)), got)
    assert(got("b") == ((138750000L, 0L, 1L)), got)
  }

  test("empty graph returns an empty typed frame, not a driver " +
      "divide-by-zero") {
    val trans = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    val nodes = Seq.empty[String].toDF("id")
    val out = PageRank.rank(trans, nodes)
    assert(out.columns.toSeq ==
      Seq("episode_id", "rank", "out_w", "in_w"))
    assert(out.count() == 0L)
  }

  test("driver arm equals the distributed arm cell-for-cell on a " +
      "multi-component weighted graph") {
    // Shapes the gate exists for: a cycle, a hub, a dangling node with
    // out-edges only, an isolated node, and weights > 1 (integer-div
    // remainders differ per round if either arm drifts).
    val trans = Seq(
      ("a", "b", 3L), ("b", "c", 2L), ("c", "a", 1L), ("a", "c", 5L),
      ("d", "a", 7L), ("d", "b", 1L), ("e", "d", 2L)
    ).toDF("src", "dst", "w")
    val nodes = Seq("a", "b", "c", "d", "e", "island").toDF("id")
    val driver = PageRank.rank(trans, nodes)
      .orderBy("episode_id").collect().map(_.toSeq).toSeq
    val dist = PageRank.distributedRank(trans, nodes)
      .orderBy("episode_id").collect().map(_.toSeq).toSeq
    assert(driver == dist)
  }

  test("mass is conserved up to damping leak on the registered graph") {
    val out = PageRank.episodePageRank(spark, "/root/testdata/sf0.001")
      .agg(sum(col("rank")), count(lit(1))).head()
    val total = out.getLong(0)
    // Each round maps total mass m to ≤ 0.15·Scale + 0.85·m (integer
    // division only loses mass), so the total stays in (0, Scale].
    assert(total > 0L && total <= PageRank.Scale, s"mass=$total")
    assert(out.getLong(1) == 20L) // every observed episode is a node
  }
}
