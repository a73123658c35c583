package graft.gold

import graft.util.Num
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-episode daily metrics (reference gold_webtoon_episode_daily_metrics.py).
  * Exercises A4–A7 (value histogram, conditional mean with null-skip), W4
  * (lead continuation), J3, D2 from SURVEY.md §2.
  *
  * W4 note: the continuation window orders episode_id LEXICOGRAPHICALLY
  * ("ep_10" < "ep_2") — this reproduces the reference's behavior
  * (gold_webtoon_episode_daily_metrics.py:90-95) bug-for-bug, as flagged in
  * SURVEY.md §7.4; the oracle mirrors it.
  *
  * Histogram boundaries compare integer cents, never doubles, so bucket
  * membership is exact on both engines.
  */
object EpisodeDaily {

  def build(sessions: DataFrame): DataFrame = {
    // Pre-reduce cascade (the country/webtoon pattern): the former base
    // planned three distincts in ONE Aggregate — RewriteDistinctAggregates'
    // Expand ×4 of every session row through the shuffle, the flagged
    // blow-up-at-100× shape. Level 1 aggregates at the (day, webtoon,
    // episode, USER) grain: session_id is user-scoped
    // ("<user_id>_<seq>", Sessionize.sessions:52) so per-user
    // distinct-session counts SUM exactly, and cleansed users are
    // non-null so level 2's count(1) IS the distinct viewer count.
    // collect_set state is one user's day-episode sessions — bounded at
    // any corpus size. Every plain sum re-sums exactly.
    val perUser = sessions
      .groupBy(col("datetime"), col("webtoon_id"), col("episode_id"),
        col("user_id"))
      .agg(
        size(collect_set(col("session_id"))).cast("bigint")
          .as("u_sessions"),
        // collect_set drops the when()'s null branch — countDistinct's
        // null-skip, per-user.
        size(collect_set(when(col("is_complete") === 1,
          col("session_id")))).cast("bigint").as("u_completed"),
        count(lit(1)).as("u_rows"),
        sum(col("is_complete")).cast("bigint").as("u_complete_rows"),
        sum(col("is_exit")).cast("bigint").as("u_exit_rows"),
        sum(col("max_value_cents")).as("u_mv_cents"),
        // A5 histogram: 5 conditional-count buckets on max_value (cents).
        sum(when(col("max_value_cents") < 4000, 1).otherwise(0))
          .cast("bigint").as("u_b0"),
        sum(when(col("max_value_cents") >= 4000 &&
          col("max_value_cents") < 8000, 1).otherwise(0))
          .cast("bigint").as("u_b1"),
        sum(when(col("max_value_cents") >= 8000 &&
          col("max_value_cents") < 12000, 1).otherwise(0))
          .cast("bigint").as("u_b2"),
        sum(when(col("max_value_cents") >= 12000 &&
          col("max_value_cents") < 16000, 1).otherwise(0))
          .cast("bigint").as("u_b3"),
        sum(when(col("max_value_cents") >= 16000, 1).otherwise(0))
          .cast("bigint").as("u_b4"),
        // A7: conditional mean over exits only, integer-exact.
        sum(when(col("is_exit") === 1, col("max_value_cents"))
          .otherwise(0L)).as("u_exit_mv_cents"))
    val base = perUser
      .groupBy(col("datetime"), col("webtoon_id"), col("episode_id")).agg(
        count(lit(1)).as("viewers"),
        sum(col("u_sessions")).as("sessions"),
        sum(col("u_completed")).as("completed_sessions"),
        sum(col("u_rows")).as("n_rows"),
        sum(col("u_complete_rows")).as("complete_rows"),
        sum(col("u_exit_rows")).as("exit_rows"),
        sum(col("u_mv_cents")).as("mv_cents_sum"),
        sum(col("u_b0")).as("v_bucket_0"),
        sum(col("u_b1")).as("v_bucket_1"),
        sum(col("u_b2")).as("v_bucket_2"),
        sum(col("u_b3")).as("v_bucket_3"),
        sum(col("u_b4")).as("v_bucket_4"),
        sum(col("u_exit_mv_cents")).as("exit_mv_cents_sum"))
      .withColumn("completion_rate",
        Num.ratio(col("complete_rows"), col("n_rows"), 4))
      .withColumn("exit_rate",
        Num.ratio(col("exit_rows"), col("n_rows"), 4))
      .withColumn("avg_max_value",
        Num.r(col("mv_cents_sum").cast("double") / (col("n_rows") * 100), 2))
      .withColumn("dropoff_value",
        when(col("exit_rows") > 0,
          Num.r(col("exit_mv_cents_sum").cast("double") /
            (col("exit_rows") * 100), 2)).otherwise(0.0))
      .drop("complete_rows", "mv_cents_sum", "exit_mv_cents_sum")

    // W4 + D2: distinct user-episode pairs, lead() to the next episode read
    // by the same user that day, then conditional count-distinct (A4).
    val userEps = sessions.select(col("datetime"), col("webtoon_id"),
      col("user_id"), col("episode_id")).distinct()
    val nextEp = Window
      .partitionBy(col("datetime"), col("webtoon_id"), col("user_id"))
      .orderBy(col("episode_id"))
    // count, not countDistinct: userEps is already distinct on
    // (day, webtoon, user, episode), so each user appears exactly once
    // per (day, webtoon, episode) group — the distinct machinery would
    // re-verify a uniqueness the generator guarantees.
    val cont = userEps
      .withColumn("next_episode", lead(col("episode_id"), 1).over(nextEp))
      .groupBy(col("datetime"), col("webtoon_id"), col("episode_id"))
      .agg(count(when(col("next_episode").isNotNull, col("user_id")))
        .as("continuing_users"))

    base
      .join(cont, Seq("datetime", "webtoon_id", "episode_id"), "left") // J3
      .na.fill(Map("continuing_users" -> 0L))
      .withColumn("continuation_rate",
        Num.guardedRatio(col("continuing_users"), col("viewers"), 4))
  }
}
