package graft.gold

import graft.util.Num
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-(platform, device, browser) daily metrics (reference
  * gold_platform_device_daily_metrics.py). Exercises A6 rate means (timeout /
  * bounce) and W5 — whole-partition (unbounded-frame) max/min windows
  * broadcasting cross-dimension gaps onto every row.
  *
  * The reference computes the three gap frames as separate aggregates joined
  * back (J9); expressing them as unbounded window functions over the base
  * aggregate is the Spark-first equivalent (same result, no extra joins —
  * SURVEY.md W5). Gaps subtract already-rounded doubles, so both engines see
  * identical operands.
  */
object PlatformDeviceDaily {

  def build(sessions: DataFrame): DataFrame = {
    val base = sessions
      .groupBy(col("datetime"), col("platform"), col("device"), col("browser"))
      .agg(
        countDistinct(col("session_id")).as("total_sessions"),
        countDistinct(col("user_id")).as("total_users"),
        count(lit(1)).as("n_rows"),
        sum(col("is_complete")).cast("bigint").as("complete_rows"),
        sum(when(col("session_state") === "TIMEOUT_EXIT", 1).otherwise(0))
          .cast("bigint").as("timeout_rows"),
        sum(when(col("duration_ms") <= 60000, 1).otherwise(0))
          .cast("bigint").as("bounce_rows"),
        sum(col("duration_ms")).as("dur_ms_sum"),
        sum(col("sum_value_cents")).as("value_cents_total"),
        sum(col("n_events")).as("events_total"))
      .withColumn("completion_rate",
        Num.ratio(col("complete_rows"), col("n_rows"), 4))
      .withColumn("timeout_rate",
        Num.ratio(col("timeout_rows"), col("n_rows"), 4))
      .withColumn("bounce_rate",
        Num.ratio(col("bounce_rows"), col("n_rows"), 4))
      .withColumn("avg_duration_ms",
        Num.ratio(col("dur_ms_sum"), col("n_rows"), 2))
      .withColumn("avg_event_value",
        Num.r(col("value_cents_total").cast("double") /
          (col("events_total") * 100), 2))
      .drop("complete_rows", "timeout_rows", "bounce_rows", "dur_ms_sum",
        "value_cents_total")

    // W5: three unbounded-frame gap windows (no orderBy ⇒ whole partition).
    val wBrowserGap = Window.partitionBy(col("datetime"), col("platform"),
      col("device"))
    val wDeviceGap = Window.partitionBy(col("datetime"), col("platform"),
      col("browser"))
    val wPlatformGap = Window.partitionBy(col("datetime"), col("device"),
      col("browser"))
    base
      .withColumn("cross_browser_completion_gap",
        Num.r(max(col("completion_rate")).over(wBrowserGap) -
          min(col("completion_rate")).over(wBrowserGap), 4))
      .withColumn("cross_device_duration_gap_ms",
        Num.r(max(col("avg_duration_ms")).over(wDeviceGap) -
          min(col("avg_duration_ms")).over(wDeviceGap), 2))
      .withColumn("cross_platform_value_gap",
        Num.r(max(col("avg_event_value")).over(wPlatformGap) -
          min(col("avg_event_value")).over(wPlatformGap), 2))
  }
}
