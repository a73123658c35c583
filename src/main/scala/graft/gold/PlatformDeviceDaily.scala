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
    // Pre-reduce cascade (the country/webtoon/episode pattern): the
    // former base planned its two distincts as an Expand ×3 of every
    // session row through the shuffle. Level 1 aggregates at the
    // (day, platform, device, browser, USER) grain — session_id is
    // user-scoped so per-user distinct-session counts sum exactly, and
    // cleansed users are non-null so level 2's count(1) IS
    // countDistinct(user_id). collect_set state is one user's day on
    // one surface — bounded at any corpus size; an unsplit
    // collect_set(user_id) at the surface grain would grow with the
    // user base, the state bound this cascade exists to avoid.
    val perUser = sessions
      .groupBy(col("datetime"), col("platform"), col("device"),
        col("browser"), col("user_id"))
      .agg(
        size(collect_set(col("session_id"))).cast("bigint")
          .as("u_sessions"),
        count(lit(1)).as("u_rows"),
        sum(col("is_complete")).cast("bigint").as("u_complete"),
        sum(when(col("session_state") === "TIMEOUT_EXIT", 1).otherwise(0))
          .cast("bigint").as("u_timeout"),
        sum(when(col("duration_ms") <= 60000, 1).otherwise(0))
          .cast("bigint").as("u_bounce"),
        sum(col("duration_ms")).as("u_dur_ms"),
        sum(col("sum_value_cents")).as("u_value_cents"),
        sum(col("n_events")).as("u_events"))
    val base = perUser
      .groupBy(col("datetime"), col("platform"), col("device"),
        col("browser"))
      .agg(
        sum(col("u_sessions")).as("total_sessions"),
        count(lit(1)).as("total_users"),
        sum(col("u_rows")).as("n_rows"),
        sum(col("u_complete")).as("complete_rows"),
        sum(col("u_timeout")).as("timeout_rows"),
        sum(col("u_bounce")).as("bounce_rows"),
        sum(col("u_dur_ms")).as("dur_ms_sum"),
        sum(col("u_value_cents")).as("value_cents_total"),
        sum(col("u_events")).as("events_total"))
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
