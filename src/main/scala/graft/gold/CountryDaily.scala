package graft.gold

import graft.util.Num
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-country daily metrics (reference gold_country_daily_metrics.py).
  * Exercises A10 (global re-aggregation + weighted means over an aggregate),
  * J6 (today-anchored retention with null-check counting), J7 (tiny global
  * join — broadcast under AQE), J8, A11 guarded indices.
  */
object CountryDaily {

  def build(sessions: DataFrame): DataFrame = {
    val base = sessions.groupBy(col("datetime"), col("country")).agg(
      countDistinct(col("session_id")).as("total_sessions"),
      countDistinct(col("user_id")).as("total_users"),
      countDistinct(struct(col("user_id"), col("webtoon_id"),
        col("episode_id"))).as("user_content_pairs"),
      count(lit(1)).as("n_rows"),
      sum(col("is_complete")).cast("bigint").as("complete_rows"),
      sum(col("sum_value_cents")).as("value_cents_total"),
      sum(col("n_events")).as("events_total"))
      .withColumn("completion_rate",
        Num.ratio(col("complete_rows"), col("n_rows"), 4))
      .withColumn("avg_event_value",
        Num.r(col("value_cents_total").cast("double") /
          (col("events_total") * 100), 2))

    // A10: re-aggregate the aggregate per day — weighted global rates.
    val globals = base.groupBy(col("datetime")).agg(
      sum(col("complete_rows")).as("g_complete"),
      sum(col("n_rows")).as("g_rows"),
      sum(col("value_cents_total")).as("g_cents"),
      sum(col("events_total")).as("g_events"))
      .withColumn("global_completion_rate",
        Num.ratio(col("g_complete"), col("g_rows"), 4))
      .withColumn("global_avg_event_value",
        Num.r(col("g_cents").cast("double") / (col("g_events") * 100), 2))
      .select(col("datetime"), col("global_completion_rate"),
        col("global_avg_event_value"))

    // J6: today-anchored retention — left join yesterday's user set, count
    // matches via the null check (the reference's anti-join emulation).
    val cUsers = sessions.select(col("datetime"), col("country"),
      col("user_id")).distinct()
    val t = cUsers.as("t")
    val y = cUsers.as("y")
    val retention = t.join(y,
        col("y.country") === col("t.country") &&
          col("y.user_id") === col("t.user_id") &&
          col("y.datetime") === date_sub(col("t.datetime"), 1), "left")
      .groupBy(col("t.datetime").as("datetime"),
        col("t.country").as("country"))
      .agg(
        countDistinct(col("t.user_id")).as("active_users"),
        countDistinct(when(col("y.user_id").isNotNull, col("t.user_id")))
          .as("returning_users"))
      .withColumn("new_users", col("active_users") - col("returning_users"))
      .withColumn("returning_ratio",
        Num.guardedRatio(col("returning_users"), col("active_users"), 4))

    base
      .join(globals, Seq("datetime"), "left")                  // J7
      .join(retention, Seq("datetime", "country"), "left")     // J8
      .withColumn("completion_index",
        when(col("global_completion_rate") > 0,
          Num.r(col("completion_rate") / col("global_completion_rate"), 4))
          .otherwise(0.0))
      .drop("complete_rows", "value_cents_total")
  }
}
