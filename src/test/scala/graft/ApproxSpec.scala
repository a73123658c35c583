package graft

import org.apache.spark.sql.functions._

/** Scale hygiene (SURVEY.md §4/§7.2-7): at 100 TB the exact
  * countDistinct's Expand-based plan is the first thing to swap for
  * approx_count_distinct (HLL++, mergeable partial state, no expand).
  * This pins the accuracy contract that swap relies on. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on harness data") {
    val ev = graft.ingest.Events.enriched(spark, "/root/testdata/sf0.01")
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact_users"),
      approx_count_distinct(col("user_id")).as("approx_users"),
      countDistinct(col("k")).as("exact_k"),
      approx_count_distinct(col("k")).as("approx_k"),
      countDistinct(col("event_id")).as("exact_ids"),
      approx_count_distinct(col("event_id"), 0.02).as("approx_ids"))
      .collect().head
    def relErr(e: Long, a: Long) = math.abs(a - e).toDouble / e
    assert(relErr(r.getAs[Long]("exact_users"),
      r.getAs[Long]("approx_users")) <= 0.05)
    assert(relErr(r.getAs[Long]("exact_k"),
      r.getAs[Long]("approx_k")) <= 0.05)
    assert(relErr(r.getAs[Long]("exact_ids"),
      r.getAs[Long]("approx_ids")) <= 0.05)
  }

  test("approx_percentile within rank tolerance of exact percentile") {
    // The 100 TB swap for CoreOps.percentileSpend's exact interpolated
    // median: approx_percentile (Greenwald-Khanna, mergeable partial
    // state). GK guarantees a RANK error bound (accuracy parameter ⇒
    // ±1/accuracy of the true rank), so assert against the value at the
    // rank bound, not a value-space epsilon.
    val ev = graft.ingest.Events.raw(spark, "/root/testdata/sf0.01")
      .withColumn("value_cents",
        expr("cast(round(value * 100, 0) as bigint)"))
    val vals = ev.select("value_cents").as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    val n = vals.length
    val accuracy = 1000 // rank error <= n / accuracy
    val approx = ev.agg(
      expr(s"approx_percentile(value_cents, array(0.5, 0.9), $accuracy)"))
      .head().getSeq[Long](0)
    for ((p, got) <- Seq(0.5, 0.9).zip(approx)) {
      val rank = (p * (n - 1)).toInt
      val tol = math.max(1, n / accuracy)
      val lo = vals(math.max(0, rank - tol))
      val hi = vals(math.min(n - 1, rank + tol))
      assert(got >= lo && got <= hi,
        s"approx p$p=$got outside rank window [$lo, $hi]")
    }
  }
}
