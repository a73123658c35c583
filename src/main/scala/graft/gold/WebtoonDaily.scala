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
    // Pre-reduction: ONE pass at the (day, webtoon, USER) grain replaces
    // both the former three-countDistinct base aggregate — whose Expand
    // multiplied every session row ×4 through the shuffle — and the
    // separate binge double-aggregate. session_id is user-scoped
    // ("<user_id>_<seq>", Sessionize.sessions:52), so the webtoon-day
    // distinct-session count is exactly the sum of per-user distincts;
    // per-group collect_set state is one user's webtoon-day (a handful
    // of sessions/episodes), bounded at any corpus size.
    val perUser = sessions
      .groupBy(col("datetime"), col("webtoon_id"), col("user_id"))
      .agg(
        size(collect_set(col("session_id"))).cast("bigint")
          .as("u_sessions"),
        collect_set(col("episode_id")).as("u_eps"),
        count(lit(1)).as("u_rows"),
        sum(col("is_complete")).cast("bigint").as("u_complete"),
        sum(col("is_exit")).cast("bigint").as("u_exit"),
        sum(col("sum_value_cents")).as("u_value_cents"),
        sum(col("n_events")).as("u_events"))

    // Final rollup with NO distinct aggregate anywhere AND no unbounded
    // aggregation buffer: users ARE the rows, sessions sum. A9 binge
    // rides the same pass: a user's distinct-episode count is size(u_eps).
    val base = perUser.groupBy(col("datetime"), col("webtoon_id")).agg(
      sum(col("u_sessions")).as("total_sessions"),
      count(lit(1)).as("total_users"),
      sum(col("u_rows")).as("n_rows"),
      sum(col("u_complete")).as("complete_rows"),
      sum(col("u_exit")).as("exit_rows"),
      sum(col("u_value_cents")).as("value_cents_total"),
      sum(col("u_events")).as("events_total"),
      count(when(size(col("u_eps")) >= 3, lit(1))).as("binge_users"))
      .withColumn("completion_rate",
        Num.ratio(col("complete_rows"), col("n_rows"), 4))
      .withColumn("exit_rate",
        Num.ratio(col("exit_rows"), col("n_rows"), 4))
      .withColumn("avg_event_value",
        Num.r(col("value_cents_total").cast("double") /
          (col("events_total") * 100), 2))
      .drop("complete_rows", "exit_rows", "value_cents_total")

    // episodes_read on a bounded side branch DIRECTLY off the (persisted)
    // sessions input: distinct (day, webtoon, episode) then count. The
    // distinct is a two-stage codegen hash aggregate whose per-group
    // state is one row — unlike collect_list, whose buffer grows with
    // users-per-webtoon-day × episodes each before any dedup runs — and
    // unlike routing through perUser, which would recompute perUser's
    // non-codegen collect_set aggregation for this consumer (column
    // pruning can't remove it here). The isNotNull filter matches
    // collect_set semantics (NULL episode_ids are not episodes read).
    val episodesRead = sessions
      .filter(col("episode_id").isNotNull)
      .select(col("datetime"), col("webtoon_id"), col("episode_id"))
      .distinct()
      .groupBy(col("datetime"), col("webtoon_id"))
      .agg(count(lit(1)).as("episodes_read"))

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

    // J5: yesterday-anchored retention over the ALREADY-DISTINCT
    // (day, webtoon, user) triple — perUser's grouping key (pruned to a
    // plain codegen distinct for this consumer), re-expressed as ONE
    // window pass: lead(datetime) per (webtoon, user) tells whether the
    // yesterday-user came back today — what the former self-join probed —
    // without recomputing the distinct for a second join input. Window
    // state is one user's visit dates (bounded). The isNotNull guard
    // mirrors the join's null-never-matches semantics for NULL users.
    val wtUsers = perUser.select(col("datetime"), col("webtoon_id"),
      col("user_id"))
    val nxt = Window.partitionBy(col("webtoon_id"), col("user_id"))
      .orderBy(col("datetime"))
    val retention = wtUsers
      .withColumn("next_dt", lead(col("datetime"), 1).over(nxt))
      .groupBy(date_add(col("datetime"), 1).as("datetime"),
        col("webtoon_id"))
      .agg(
        count(lit(1)).as("yesterday_users"),
        count(when(col("user_id").isNotNull &&
          col("next_dt") === date_add(col("datetime"), 1), lit(1)))
          .as("returned_users"))
      .withColumn("retention_rate",
        Num.guardedRatio(col("returned_users"), col("yesterday_users"), 4))

    base
      .join(episodesRead, Seq("datetime", "webtoon_id"), "left")
      .join(deepest, Seq("datetime", "webtoon_id"), "left")    // J4
      .join(retention, Seq("datetime", "webtoon_id"), "left")
      .na.fill(Map("binge_users" -> 0L, "episodes_read" -> 0L,
        "yesterday_users" -> 0L, "returned_users" -> 0L,
        "retention_rate" -> 0.0, "deepest_episode_id" -> "none"))
  }
}
