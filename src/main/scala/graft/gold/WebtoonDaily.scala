package graft.gold

import graft.util.Num
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-webtoon daily metrics (reference gold_webtoon_daily_metrics.py).
  * Exercises W2 (argmax via row_number), A9 (binge two-level agg), J4, and
  * the J5 yesterday-anchored day-over-day retention self-join.
  *
  * Keeps the reference's Gold→Gold dependency (C5): the deepest-episode
  * argmax reads the EpisodeDaily aggregate, exactly as
  * gold_webtoon_daily_metrics.py:74-85 reads gold.webtoon_episode_daily_metrics.
  */
object WebtoonDaily {

  def build(sessions: DataFrame, episodeDaily: DataFrame): DataFrame = {
    val base = sessions.groupBy(col("datetime"), col("webtoon_id")).agg(
      countDistinct(col("session_id")).as("total_sessions"),
      countDistinct(col("user_id")).as("total_users"),
      countDistinct(col("episode_id")).as("episodes_read"),
      count(lit(1)).as("n_rows"),
      sum(col("is_complete")).cast("bigint").as("complete_rows"),
      sum(col("is_exit")).cast("bigint").as("exit_rows"),
      sum(col("sum_value_cents")).as("value_cents_total"),
      sum(col("n_events")).as("events_total"))
      .withColumn("completion_rate",
        Num.ratio(col("complete_rows"), col("n_rows"), 4))
      .withColumn("exit_rate",
        Num.ratio(col("exit_rows"), col("n_rows"), 4))
      .withColumn("avg_event_value",
        Num.r(col("value_cents_total").cast("double") /
          (col("events_total") * 100), 2))
      .drop("complete_rows", "exit_rows", "value_cents_total")

    // W2: deepest episode = argmax(avg_max_value) per webtoon-day, ties
    // broken by episode_id — row_number + rn=1 filter over the Gold→Gold
    // input (episodeDaily).
    val deepest = {
      val w = Window.partitionBy(col("datetime"), col("webtoon_id"))
        .orderBy(col("avg_max_value").desc, col("episode_id"))
      episodeDaily
        .select(col("datetime"), col("webtoon_id"), col("episode_id"),
          col("avg_max_value"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("datetime"), col("webtoon_id"),
          col("episode_id").as("deepest_episode_id"))
    }

    // A9: binge users — two-level aggregate (per-user distinct episodes,
    // then conditional count-distinct of users with >= 3).
    val binge = sessions
      .groupBy(col("datetime"), col("webtoon_id"), col("user_id"))
      .agg(countDistinct(col("episode_id")).as("eps"))
      .groupBy(col("datetime"), col("webtoon_id"))
      .agg(countDistinct(when(col("eps") >= 3, col("user_id")))
        .as("binge_users"))

    // J5: yesterday-anchored retention. Left join yesterday's distinct
    // (webtoon, user) set to today's; retention = returned / yesterday.
    val wtUsers = sessions.select(col("datetime"), col("webtoon_id"),
      col("user_id")).distinct()
    val y = wtUsers.as("y")
    val t = wtUsers.as("t")
    val retention = y.join(t,
        col("t.webtoon_id") === col("y.webtoon_id") &&
          col("t.user_id") === col("y.user_id") &&
          col("t.datetime") === date_add(col("y.datetime"), 1), "left")
      .groupBy(date_add(col("y.datetime"), 1).as("datetime"),
        col("y.webtoon_id").as("webtoon_id"))
      .agg(
        countDistinct(col("y.user_id")).as("yesterday_users"),
        countDistinct(when(col("t.user_id").isNotNull, col("y.user_id")))
          .as("returned_users"))
      .withColumn("retention_rate",
        Num.guardedRatio(col("returned_users"), col("yesterday_users"), 4))

    base
      .join(deepest, Seq("datetime", "webtoon_id"), "left")    // J4
      .join(binge, Seq("datetime", "webtoon_id"), "left")
      .join(retention, Seq("datetime", "webtoon_id"), "left")
      .na.fill(Map("binge_users" -> 0L, "yesterday_users" -> 0L,
        "returned_users" -> 0L, "retention_rate" -> 0.0,
        "deepest_episode_id" -> "none"))
  }
}
