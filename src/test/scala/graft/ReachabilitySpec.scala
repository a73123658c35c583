package graft

import graft.ops.Reachability

/** WITH RECURSIVE reachability: hand-computed walk counts on a chain
  * and on a cycle (the depth bound must terminate cyclic recursion). */
class ReachabilitySpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], maxHops: Int = 3) =
    Reachability.reachability(spark,
        edges.toDF("src", "dst"), maxHops)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getInt(2), r.getLong(3))).toMap

  test("chain a->b->c->d enumerates every bounded walk once") {
    val out = run(Seq(("a", "b"), ("b", "c"), ("c", "d")))
    assert(out == Map(
      ("a", "b") -> ((1, 1L)), ("a", "c") -> ((2, 1L)),
      ("a", "d") -> ((3, 1L)),
      ("b", "c") -> ((1, 1L)), ("b", "d") -> ((2, 1L)),
      ("c", "d") -> ((1, 1L))), out)
  }

  test("driver arm == recursive-CTE arm on a cyclic weighted multigraph") {
    // Duplicate edges (a->b twice) are distinct walks; cycle + hub +
    // dangling dst exercise multiplicity, termination and min-hop.
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "c"), ("c", "a"),
      ("b", "d"), ("d", "e"), ("c", "c"))
    val viaDriver = run(edges) // 7 edges: the gate selects the driver arm
    val viaSql = Reachability.sqlReach(spark,
        edges.toDF("src", "dst").persist(), 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getInt(2), r.getLong(3))).toMap
    assert(viaDriver == viaSql, s"driver=$viaDriver sql=$viaSql")
  }

  test("two-cycle terminates at the hop bound with exact walk counts") {
    // a->b->a: walks from a within 3 hops: a->b (1), a->b->a (2),
    // a->b->a->b (3) — so (a,b) has 2 walks (min 1), (a,a) has 1
    // (min 2); symmetric for b. Without the depth bound this recursion
    // would never reach a fixpoint.
    val out = run(Seq(("a", "b"), ("b", "a")))
    assert(out == Map(
      ("a", "b") -> ((1, 2L)), ("a", "a") -> ((2, 1L)),
      ("b", "a") -> ((1, 2L)), ("b", "b") -> ((2, 1L))), out)
  }
}
