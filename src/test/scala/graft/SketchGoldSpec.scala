package graft

import graft.runtime.SketchGold
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The sketch gold's claims, proven on real sf0.001 events:
  * incremental union maintenance == batch build EXACTLY (estimates are
  * pure functions of the input set), redelivery is absorbed by set
  * semantics, merge shape doesn't matter, the recompute path expresses
  * deletion, and rolling WAU from stored state matches both the exact
  * count (coupon-exact regime) and the from-raw sketch answer. */
class SketchGoldSpec extends SparkSpec {
  import spark.implicits._

  private lazy val active = graft.ingest.Events
    .raw(spark, "/root/testdata/sf0.001")
    .transform(graft.ingest.Events.withTsUs)
    .select(col("user_id"),
      to_date(timestamp_micros(col("ts_us"))).as("day"))
    .distinct()
    .persist()

  /** (day, dau_est) pairs for comparison — the sketch BYTES are an
    * implementation detail; the estimate is the contract. */
  private def estimates(df: DataFrame): Map[String, Long] =
    df.select(col("day").cast("string"), col("dau_est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("incremental union across 3 batches == batch build, exactly") {
    val dir = tmpDir("sketch-inc")
    // Arbitrary thirds by user hash — days overlap across batches, so
    // every batch unions into existing rows, not just appends.
    for (i <- 0 to 2)
      SketchGold.unionDelta(spark, dir,
        active.filter(pmod(hash(col("user_id")), lit(3)) === i))
    val batch = SketchGold.dailySketch(active)
    assert(estimates(spark.read.parquet(dir)) == estimates(batch),
      "incremental sketch estimates diverged from the batch build")
  }

  test("redelivered delta is a no-op (set semantics)") {
    val dir = tmpDir("sketch-redeliver")
    SketchGold.unionDelta(spark, dir, active)
    val once = estimates(spark.read.parquet(dir))
    // The same full frame again: registers are bucket-wise max, so
    // nothing can grow.
    SketchGold.unionDelta(spark, dir, active)
    assert(estimates(spark.read.parquet(dir)) == once,
      "redelivery changed the estimates")
  }

  test("estimate is partitioning- and merge-order-independent") {
    val a = estimates(SketchGold.dailySketch(active))
    val b = estimates(SketchGold.dailySketch(
      active.repartition(64, col("user_id"))))
    val c = estimates(SketchGold.dailySketch(
      active.orderBy(col("user_id").desc)))
    assert(a == b && a == c,
      "sketch estimate depended on physical layout")
  }

  test("union preserves register resolution PAST the coupon regime: " +
      "150k distinct, unioned thirds == one build, exactly") {
    // The coupon-exact tests above can't see a union-side lgK
    // downgrade (any resolution is exact there). 150k distinct is deep
    // in HLL-array mode at lgK 14; register state is bucket-wise max,
    // so IF the union keeps the same lgK, union-of-parts must equal
    // the one-shot build to the BIT — same registers, same estimate.
    val big = spark.range(150000)
      .select(lit(java.sql.Date.valueOf("2024-06-01")).as("day"),
        col("id").as("user_id"))
    val whole = estimates(SketchGold.dailySketch(big))
    val parts = (0 to 2).map(i => SketchGold
      .dailySketch(big.filter(pmod(col("user_id"), lit(3)) === i))
      .select(col("day"), col("user_sketch")))
    val unioned = parts.reduce(_ unionByName _)
      .groupBy(col("day"))
      .agg(hll_union_agg(col("user_sketch"), lit(false))
        .as("user_sketch"))
      .withColumn("dau_est", hll_sketch_estimate(col("user_sketch")))
    assert(estimates(unioned) == whole,
      "union-of-parts estimate diverged from the one-shot build — " +
        "the union is degrading sketch resolution")
  }

  test("recompute path deletes a day whose rows vanished") {
    val dir = tmpDir("sketch-del")
    SketchGold.unionDelta(spark, dir, active)
    val days = active.select(col("day")).distinct()
      .orderBy(col("day")).collect().map(_.getDate(0))
    val dropped = days.last
    // The re-derived slice for the affected day is EMPTY (every event
    // moved off it); union could never express this.
    SketchGold.recomputeDelta(spark, dir,
      active.filter(col("day") =!= lit(dropped) && lit(false)),
      active.select(col("day")).distinct()
        .filter(col("day") === lit(dropped)))
    val left = spark.read.parquet(dir).select(col("day").cast("string"))
      .collect().map(_.getString(0)).toSet
    assert(!left.contains(dropped.toString), "vanished day survived")
    assert(left.size == days.length - 1, s"unexpected days: $left")
  }

  test("rolling edges: window=1 is the daily identity, and a gap day " +
      "still reports its trailing window (not a fabricated zero)") {
    val dir = tmpDir("sketch-edge")
    // Two active days with an 3-day gap between them.
    val rows = Seq(
      ("2024-06-01", 1L), ("2024-06-01", 2L), ("2024-06-05", 2L))
      .toDF("d", "user_id")
      .select(col("d").cast("date").as("day"), col("user_id"))
    SketchGold.unionDelta(spark, dir, rows)
    val w1 = SketchGold.rollingDistinct(spark, dir, 1)
      .select(col("day").cast("string"), col("distinct_est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w1 == Map("2024-06-01" -> 2L, "2024-06-05" -> 1L))
    val w7 = SketchGold.rollingDistinct(spark, dir, 7)
      .select(col("day").cast("string"), col("distinct_est"),
        col("n_days"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // June 3 had no activity, but its trailing-7 window contains
    // June 1: the rolling read must still answer 2 (from 1 sketch row).
    assert(w7("2024-06-03") == (2L, 1L))
    // June 5's window spans both sketch rows; user 2 appears in both
    // days and must count once.
    assert(w7("2024-06-05") == (2L, 2L))
  }

  test("rolling 7-day distinct from stored sketches == exact count " +
      "and == the from-raw sketch answer") {
    val dir = tmpDir("sketch-roll")
    SketchGold.unionDelta(spark, dir, active)
    val rolled = SketchGold.rollingDistinct(spark, dir, 7)
      .select(col("day").cast("string"), col("distinct_est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Exact trailing-7d distinct (the dauWau expansion).
    val exact = active
      .select(col("user_id"),
        explode(sequence(lit(0), lit(6))).as("off"), col("day"))
      .select(col("user_id"), expr("date_add(day, off)").as("day"))
      .distinct().groupBy(col("day")).agg(count(lit(1)).as("n"))
      .select(col("day").cast("string"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sf0.001 has ~100 users: well inside the sketch's coupon-exact
    // regime, so the estimates must be EQUAL, not just within rsd.
    for ((d, n) <- exact)
      assert(rolled(d) == n, s"day $d: rolled ${rolled(d)} != exact $n")
    assert(rolled.keySet == exact.keySet)
  }

  test("the rolling serving plan scans ONLY the stored sketch table") {
    val dir = tmpDir("sketch-scan")
    SketchGold.unionDelta(spark, dir, active)
    // The 100 TB contract of the serving path: per-day cost is |window|
    // sketch ROWS. The physical plan must read exactly one relation —
    // the materialized gold — and never touch an events file.
    // sparkPlan, not executedPlan: AQE wraps the latter in an
    // AdaptiveSparkPlanExec whose tree isn't traversable pre-execution.
    val scans = SketchGold.rollingDistinct(spark, dir, 30)
      .queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.toString)
      }.flatten
    assert(scans.nonEmpty && scans.forall(_.contains(dir)),
      s"serving plan read outside the sketch gold: $scans")
  }
}
