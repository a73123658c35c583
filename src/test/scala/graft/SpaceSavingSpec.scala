package graft

import org.apache.spark.sql.functions._

/** SpaceSaving guarantees under forced evictions and real partial
  * merges: every guaranteed-heavy item is kept, over-estimated only,
  * and within its tracked error ≤ n/k. */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def summary(items: Seq[String], k: Int, parts: Int)
      : Map[String, (Long, Long)] = {
    graft.functions.SpaceSaving.register(spark)
    items.toDF("token").repartition(parts)
      .agg(expr(s"graft_spacesaving(token, $k)").as("sk"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("heavy item survives evictions across merged partials") {
    // 100×a + 50×b + 50 singletons, k=4 (far fewer than 52 distinct):
    // n=200, threshold n/k=50 → only "a" is guaranteed.
    val items = Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
      (1 to 50).map(i => s"s$i")
    for (parts <- Seq(1, 7)) {
      val sk = summary(scala.util.Random.shuffle(items), 4, parts)
      assert(sk.size <= 4)
      val (est, err) = sk.getOrElse("a",
        fail(s"heavy item evicted (parts=$parts): $sk"))
      assert(est >= 100, s"underestimate: $est")
      assert(est - 100 <= err, s"err bound broken: est=$est err=$err")
      assert(err * 4 <= 200, s"err exceeds n/k: $err")
    }
  }

  test("stress: guarantees survive deep arbitrary merge trees of " +
      "serialized partials (64+ partitions)") {
    // Spark only ever exercises shallow two-level folds; the mergeable-
    // summaries claim (Agarwal et al. 2012) is about ANY merge tree.
    // Drive the aggregate directly: 64–128 partition partials, then a
    // random-order nested merge tree where every operand round-trips
    // through serialize/deserialize — the shape a 1000-executor
    // multi-stage partial aggregation actually produces. The truncation
    // step's absorbed min-inflation must keep every contract property:
    // heavy items present, over-estimate only, tracked err ≥ the
    // over-count, err ≤ n/k.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 4) {
      val k = 4 + rnd.nextInt(5)
      val agg = graft.functions.SpaceSavingStrings(
        BoundReference(0, StringType, nullable = true), k)
      val universe = 30 + rnd.nextInt(50)
      val z = (0 until universe).map(j => 1.0 / (j + 1)).sum
      val stream = (0 until 2000 + rnd.nextInt(2000)).map { _ =>
        val r = rnd.nextDouble()
        var i = 0; var acc = 0.0
        while (acc + 1.0 / ((i + 1) * z) < r && i < universe - 1) {
          acc += 1.0 / ((i + 1) * z); i += 1
        }
        s"w$i"
      }
      val n = stream.size.toLong
      val exact = stream.groupBy(identity).map { case (w, g) =>
        w -> g.size.toLong }
      val parts = 64 + rnd.nextInt(65)
      val bufs = scala.collection.mutable.ArrayBuffer(
        stream.grouped(math.max(1, stream.size / parts)).map { ch =>
          val b = agg.createAggregationBuffer()
          ch.foreach(it =>
            agg.update(b, InternalRow(UTF8String.fromString(it))))
          b
        }.toSeq: _*)
      assert(bufs.size >= 64, s"trial $trial: only ${bufs.size} partials")
      while (bufs.size > 1) {
        val a = bufs.remove(rnd.nextInt(bufs.size))
        val b = bufs.remove(rnd.nextInt(bufs.size))
        bufs += agg.merge(agg.deserialize(agg.serialize(a)),
          agg.deserialize(agg.serialize(b)))
      }
      val sk = {
        import scala.jdk.CollectionConverters._
        bufs.head.asScala.map { case (w, a) => w -> (a(0), a(1)) }.toMap
      }
      assert(sk.size <= k)
      exact.filter { case (_, c) => c * k > n }.foreach { case (w, c) =>
        val (est, err) = sk.getOrElse(w,
          fail(s"trial $trial: heavy $w (cnt=$c, n=$n, k=$k) missing " +
            s"after deep merges"))
        assert(est >= c, s"trial $trial: underestimate $w est=$est cnt=$c")
        assert(est - c <= err,
          s"trial $trial: err bound broken $w est=$est err=$err cnt=$c")
        assert(err * k <= n,
          s"trial $trial: err exceeds n/k: $w err=$err n=$n k=$k")
      }
    }
  }

  test("property: guarantees hold on random zipf-ish streams") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 6) {
      val k = 3 + rnd.nextInt(6)
      // Zipf-ish: item i has weight ~ 1/(i+1).
      val universe = 20 + rnd.nextInt(40)
      val items = (0 until 400 + rnd.nextInt(800)).map { _ =>
        val r = rnd.nextDouble()
        var i = 0; var acc = 0.0
        val z = (0 until universe).map(j => 1.0 / (j + 1)).sum
        while (acc + 1.0 / ((i + 1) * z) < r && i < universe - 1) {
          acc += 1.0 / ((i + 1) * z); i += 1
        }
        s"w$i"
      }
      val n = items.size.toLong
      val exact = items.groupBy(identity).map { case (w, g) =>
        w -> g.size.toLong }
      val sk = summary(items, k, 1 + rnd.nextInt(8))
      exact.filter { case (_, c) => c * k > n }.foreach { case (w, c) =>
        val (est, err) = sk.getOrElse(w,
          fail(s"trial $trial: heavy $w (cnt=$c, n=$n, k=$k) missing"))
        assert(est >= c && est - c <= err && err * k <= n,
          s"trial $trial: $w est=$est err=$err cnt=$c n=$n k=$k")
      }
    }
  }
}
