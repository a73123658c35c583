package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time-correct feature assembly — the operator a feature store
  * (the reference's namesake) exists for: attach to every training label
  * the feature values that were KNOWN at that label's timestamp, never
  * anything later (leakage-free training-set construction).
  *
  * Shape: daily per-user feature snapshots (per-day activity + cumulative
  * state, one window pass) become valid at the NEXT midnight — a snapshot
  * covering day D can only be consumed by labels at or after D+1 00:00,
  * so a label never sees an aggregate containing itself or anything from
  * its own day. The label ⟕ snapshot attach is the [[AsOfJoin]] union +
  * single-partitioned-sort plan: one shuffle on user_id, linear, no range
  * explosion. Verified against DuckDB's native `ASOF LEFT JOIN`.
  *
  * At 100 TB the snapshot table is the materialized feature store
  * (user × day, partitioned by day, bucketed by user — [[
  * graft.runtime.Bucketed]]); labels stream in and the as-of attach stays
  * one co-partitioned shuffle. */
object Features {

  /** Daily user snapshots: per-day event count and purchase spend, plus
    * cumulative (to-date) state, stamped with the µs instant the snapshot
    * becomes servable (next midnight UTC). */
  def dailySnapshots(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), col("event_date"))
      .agg(count(lit(1)).as("n_events_day"),
        sum(when(col("event_type") === "purchase", col("value_cents"))
          .otherwise(0L)).as("spend_day_cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_date"))
    daily
      .withColumn("days_active_to_date",
        row_number().over(w).cast("int"))
      .withColumn("spend_to_date_cents",
        sum(col("spend_day_cents"))
          .over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      .withColumn("snap_ts_us", expr(
        "unix_timestamp(cast(date_add(event_date, 1) as timestamp)) " +
          "* 1000000L"))
      .select(col("user_id"), col("event_date").as("feat_date"),
        col("snap_ts_us"), col("n_events_day"), col("spend_day_cents"),
        col("days_active_to_date"), col("spend_to_date_cents"))
  }

  /** Registered query: every purchase label gets the latest servable
    * snapshot (strictly prior day or earlier — nulls for a user's
    * first-day purchases). */
  def userPitFeatures(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.ingest.Events.raw(spark, dir)
      .transform(graft.ingest.Events.withTsUs)
      .withColumn("value_cents",
        expr("try_cast(round(value * 100, 0) as bigint)"))
      .withColumn("event_date", to_date(expr("timestamp_micros(ts_us)")))
    val labels = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event_id"),
        col("ts_us"), col("value_cents"))
    val snaps = dailySnapshots(
      e.select("user_id", "event_date", "event_type", "value_cents"))
    AsOfJoin.asOf(labels, snaps, Seq("user_id"), "ts_us", "snap_ts_us")
      .select("user_id", "purchase_event_id", "ts_us", "value_cents",
        "feat_date", "snap_ts_us", "n_events_day", "spend_day_cents",
        "days_active_to_date", "spend_to_date_cents")
  }
}
