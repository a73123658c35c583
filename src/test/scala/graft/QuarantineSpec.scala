package graft

import graft.ingest.Events
import graft.runtime.{Incremental, Pipeline}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The dead-letter contract: rows the cleanse gate drops are exactly
  * the rows the quarantine captures — per reason — and the capture is
  * replay-idempotent in both chains (full-recompute replaceAll;
  * per-source-batch replacePartitions). */
class QuarantineSpec extends SparkSpec {

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Good rows + one of every poison class (IngestRobustnessSpec's
    * taxonomy), plus one DOUBLE-failure row (null type AND bad props)
    * that must land under exactly one primary reason. */
  private def mixedRows: Seq[Row] = Seq(
    Row(1L, t0, 10L, "view", 1.5, """{"k": 7}"""),
    Row(2L, t0, 11L, "click", 2.5, """{"k": 3}"""),
    Row(3L, t0, null, "view", 1.5, """{"k": 7}"""),    // null user
    Row(4L, null, 10L, "view", 1.5, """{"k": 7}"""),   // null ts
    Row(5L, t0, 10L, null, 1.5, """{"k": 7}"""),       // null type
    Row(6L, t0, 10L, "view", Double.NaN, """{"k": 7}"""), // bad cents
    Row(7L, t0, 10L, "view", 1.0e18, """{"k": 7}"""),     // overflow
    Row(8L, t0, 10L, "view", 1.5, "not json"),         // bad props
    Row(9L, t0, 10L, null, 1.5, "not json"))           // double failure

  private def df(rows: Seq[Row]) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows, 2), schema)

  test("cleanse and rejects partition the input exactly, per reason") {
    val enriched = Events.enrich(df(mixedRows))
    val kept = Events.cleanse(enriched)
    val rej = Events.rejects(enriched)
    assert(kept.count() + rej.count() === enriched.count())
    val byReason = rej.groupBy(col("reject_reason")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byReason === Map(
      "not_null_user_id" -> 1L, "not_null_ts" -> 1L,
      "not_null_event_type" -> 2L, // incl. the double-failure row
      "valid_value_cents" -> 2L, "valid_props_k" -> 1L))
    // The double-failure row carries ALL its reasons but ONE primary.
    val dbl = rej.filter(col("event_id") === 9L).head()
    assert(dbl.getAs[Seq[String]]("reject_reasons") ===
      Seq("not_null_event_type", "valid_props_k"))
    assert(dbl.getAs[String]("reject_reason") === "not_null_event_type")
  }

  test("runDaily persists the rejects; re-running converges (no dupes)") {
    val sfDir = tmpDir("q-sf")
    df(mixedRows).write.mode("overwrite")
      .parquet(s"$sfDir/events.parquet")
    val wh = tmpDir("q-wh")
    Pipeline.runDaily(spark, sfDir, wh)
    def q = spark.read.parquet(s"$wh/quarantine_events")
    val dropped = Events.enrich(df(mixedRows)).count() -
      Events.cleanse(Events.enrich(df(mixedRows))).count()
    assert(q.count() === dropped)
    assert(q.groupBy(col("reject_reason")).count().count() === 5)
    Pipeline.runDaily(spark, sfDir, wh) // replay
    assert(q.count() === dropped, "replay duplicated quarantine rows")
  }

  test("incremental chain quarantines per source batch, " +
      "retry-idempotent") {
    val bronze = tmpDir("q-bronze")
    val wh = tmpDir("q-wh-inc")
    val good = mixedRows.take(2)
    val batch2 = mixedRows.drop(2) // all 7 poison rows
    Incremental.appendBatch(spark, bronze, df(good), 1L)
    var wm = Pipeline.runDailyIncremental(spark, bronze, wh, None)
    def q = spark.read.parquet(s"$wh/quarantine_events")
    // Batch 1 is clean: its quarantine partition is empty (the table
    // may not even have visible rows yet).
    val p1 = new org.apache.hadoop.fs.Path(s"$wh/quarantine_events")
    val fs = p1.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p1, "batch_id=1")) ||
      q.filter(col("batch_id") === 1L).isEmpty)

    Incremental.appendBatch(spark, bronze, df(batch2), 2L)
    val wm2 = Pipeline.runDailyIncremental(spark, bronze, wh, wm)
    assert(q.count() === 7L)
    assert(q.filter(col("batch_id") === 2L).count() === 7L)
    val reasons = q.groupBy(col("reject_reason")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reasons("not_null_event_type") === 2L)
    assert(reasons("valid_value_cents") === 2L)

    // RETRY the batch: a crashed run re-consumes from the old
    // watermark — its quarantine partition replaces, never appends.
    Pipeline.runDailyIncremental(spark, bronze, wh, wm)
    assert(q.count() === 7L, "retried batch duplicated quarantine rows")
    // No-op run (watermark current): table untouched.
    Pipeline.runDailyIncremental(spark, bronze, wh, wm2)
    assert(q.count() === 7L)
  }

  test("a retried batch whose reject set CHANGED replaces its " +
      "partition wholesale — replace-on-retry is the audit semantics") {
    val bronze = tmpDir("q-bronze-retry")
    val wh = tmpDir("q-wh-retry")
    // Batch 1: two good rows + two poison rows (null user, bad props).
    val firstLanding = mixedRows.take(3) :+ mixedRows(7)
    Incremental.appendBatch(spark, bronze, df(firstLanding), 1L)
    Pipeline.runDailyIncremental(spark, bronze, wh, None)
    def q = spark.read.parquet(s"$wh/quarantine_events")
    assert(q.filter(col("batch_id") === 1L).count() === 2L)

    // An upstream CORRECTION re-lands the batch with the bad-props row
    // repaired (the same shape as a cleanse-rule fix: the batch's
    // reject set shrinks), and the chain retries from the old
    // watermark. The quarantine partition must converge to the NEW
    // judgment — the repaired row's stale reject replaced away, never
    // appended beside.
    val repaired = mixedRows.take(3) :+
      Row(8L, t0, 10L, "view", 1.5, """{"k": 2}""")
    graft.silver.MergeUpsert.replacePartitions(spark, bronze,
      df(repaired).withColumn("batch_id", lit(1L)), Seq(1L),
      partitionCol = "batch_id")
    Pipeline.runDailyIncremental(spark, bronze, wh, None)
    val after = q.filter(col("batch_id") === 1L).localCheckpoint()
    assert(after.count() === 1L,
      "the repaired row's stale reject must be replaced away")
    assert(after.head().getAs[String]("reject_reason")
      === "not_null_user_id")
  }

  test("both chains share ONE quarantine partition scheme: a full " +
      "backfill then incremental maintenance reads as one table") {
    val sfDir = tmpDir("q-sf-mix")
    df(mixedRows).write.mode("overwrite")
      .parquet(s"$sfDir/events.parquet")
    val wh = tmpDir("q-wh-mix")
    // Full-recompute chain: rejects land under the synthetic batch -1.
    Pipeline.runDaily(spark, sfDir, wh)
    // Incremental maintenance over the SAME warehouse: a fresh bronze
    // batch with two more poison rows lands under its source batch id.
    val bronze = tmpDir("q-bronze-mix")
    val late = Seq(
      Row(20L, t0, 30L, "view", 3.5, """{"k": 1}"""),
      Row(21L, t0, null, "view", 1.5, """{"k": 7}"""),
      Row(22L, t0, 31L, "view", 1.5, "not json"))
    Incremental.appendBatch(spark, bronze, df(late), 7L)
    Pipeline.runDailyIncremental(spark, bronze, wh, None)
    // One partition column across both chains — the mixed
    // reject_reason=*/batch_id=* layout would fail this read outright.
    val q = spark.read.parquet(s"$wh/quarantine_events")
    val byBatch = q.groupBy(col("batch_id").cast("long")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBatch === Map(-1L -> 7L, 7L -> 2L),
      "per-batch reject accounting diverged")
    // Which is exactly the per-batch reject-rate drift audit the
    // batch-lineage layout exists for (the quarantine table is its own
    // change log — one replace-idempotent partition per source batch).
    assert(q.filter(col("batch_id") === 7L)
      .groupBy(col("reject_reason")).count().count() === 2L)
  }
}
