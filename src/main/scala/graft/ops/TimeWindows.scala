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
