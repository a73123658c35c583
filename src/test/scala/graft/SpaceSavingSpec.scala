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
