package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tumbling event-time windows — the batch form of the Structured
  * Streaming `window()` aggregation (streaming/StreamingSessionize uses
  * the same function with a watermark; on a stream this plan runs
  * incrementally with partial state per window). Hourly buckets are
  * epoch-aligned in both engines (Spark `window` and DuckDB
  * `time_bucket`), and the output carries the window start as epoch
  * microseconds so the time domain stays integer end-to-end.
  */
object TimeWindows {

  /** Per-hour event counts, distinct users, and exact cents volume over
    * the events table. One shuffle on the (coarse, non-skewed) window
    * key; countDistinct expands under RewriteDistinctAggregates. */
  def tumblingHourly(spark: SparkSession, dir: String): DataFrame =
    graft.ingest.Events.raw(spark, dir)
      .transform(graft.ingest.Events.withTsUs)
      .withColumn("value_cents",
        expr("try_cast(round(value * 100, 0) as bigint)"))
      .groupBy(window(timestamp_micros(col("ts_us")), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value_cents")).as("sum_value_cents"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("n_events"), col("n_users"), col("sum_value_cents"))

  /** Gap-filled hourly resample per platform with LOCF carry-forward.
    * [[graft.ops.EventOps.resampleHourlyFilled]] covers the plain
    * zero-fill form (event_type grain); what this adds is the other
    * half of time-series regularization — LAST-OBSERVATION-CARRIED-
    * FORWARD imputation (`last(..., ignoreNulls)` over the dense grid,
    * the IGNORE NULLS window semantics nothing else in the battery
    * exercises) plus the explicit gap flag a feature pipeline needs to
    * distinguish imputed cells from observed zeros. The dense grid is dimension ×
    * calendar (platforms × hours — the hot-bucket table's
    * calendar-bounded argument again: a decade is ≤87.6k hours), built
    * by a 1-row bounds broadcast + sequence explode, never a
    * corpus-scale join; the LOCF window partitions by platform with a
    * calendar-bounded series per partition, so window state never
    * scales with the corpus. */
  def gapfillHourly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val HourUs = 3600000000L
    val base = graft.ingest.Events.cleansed(spark, dir)
      .withColumn("hour_us", expr(s"(ts_us div ${HourUs}L) * ${HourUs}L"))
      .groupBy(col("platform"), col("hour_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_cents")).as("sum_cents"))
      // localCheckpoint, not persist (the KnnEval convention): three
      // subtrees read this platform×hour aggregate (bounds, the grid's
      // platform distinct, the fill join) and the returned frame is
      // lazy, so persist would leak past the action. Blocks free with
      // the RDD's GC.
      .localCheckpoint()
    val bounds = base.agg(min(col("hour_us")).as("h0"),
      max(col("hour_us")).as("h1"))
    val grid = base.select(col("platform")).distinct()
      .crossJoin(broadcast(bounds))
      // explode_outer + null filter: derived array (the
      // InferFiltersFromGenerate pitfall).
      .select(col("platform"), explode_outer(
        expr(s"sequence(h0, h1, ${HourUs}L)")).as("hour_us"))
      .filter(col("hour_us").isNotNull)
    val w = Window.partitionBy(col("platform")).orderBy(col("hour_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(base, Seq("platform", "hour_us"), "left")
      .withColumn("is_gap",
        when(col("n_events").isNull, 1).otherwise(0))
      .withColumn("locf_sum_cents",
        coalesce(last(col("sum_cents"), ignoreNulls = true).over(w),
          lit(0L)))
      .select(col("platform"), col("hour_us"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("is_gap"), col("locf_sum_cents"))
  }

  /** Sliding hourly windows on a 30-minute slide: every event lands in
    * exactly two windows (start = floor₃₀(t) and floor₃₀(t) − 30 min),
    * which is also how the oracle recomputes the assignment with a
    * two-way union. The 2× row amplification happens inside the window
    * operator's Expand, before the single aggregate shuffle. */
  def slidingHourly(spark: SparkSession, dir: String): DataFrame =
    graft.ingest.Events.raw(spark, dir)
      .transform(graft.ingest.Events.withTsUs)
      .withColumn("value_cents",
        expr("try_cast(round(value * 100, 0) as bigint)"))
      .groupBy(window(timestamp_micros(col("ts_us")), "1 hour",
        "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value_cents")).as("sum_value_cents"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("n_events"), col("n_users"), col("sum_value_cents"))
}
