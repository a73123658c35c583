package graft.sql

import graft.ingest.Events

/** The silver/gold pipeline as a PURE SQL surface.
  *
  * The reference's tables are consumed through SQL (Iceberg tables behind
  * Trino/Spark SQL — silver_user_session_events.py, gold_*_metrics.py);
  * [[Ddl]] declares the schemas, and this object provides the matching
  * INSERT/SELECT texts for graft's own tables so a SQL-only user can run
  * the sessionization and the user gold without touching the DataFrame
  * API. Each statement mirrors the DataFrame path expression-for-
  * expression ([[graft.silver.Sessionize]], [[graft.gold.UserDaily]]);
  * SqlParitySpec asserts the two paths produce identical frames, so the
  * SQL text is pinned to the engine semantics, not a lookalike.
  */
object PipelineSql {

  /** Silver sessionization (dedup → gap sessionize → aggregate → state
    * machine) as one INSERT ... SELECT from a cleansed-events view.
    * Mirrors Dedup.keepLatest + Sessionize.sessions. */
  def silverInsert(targetTable: String, eventsView: String,
                   gapUs: Long = Events.SessionGapUs,
                   asOfUs: Long = Events.AsOfUs,
                   timeoutUs: Long = Events.TimeoutUs): String =
    s"""INSERT OVERWRITE TABLE $targetTable
       |WITH dedup AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY event_id ORDER BY ts_us DESC) AS rn
       |    FROM $eventsView) WHERE rn = 1
       |),
       |gapped AS (
       |  SELECT *, CASE WHEN prev_ts_us IS NULL
       |      OR ts_us - prev_ts_us > ${gapUs}L THEN 1 ELSE 0 END AS new_sess
       |  FROM (SELECT *, lag(ts_us, 1) OVER (
       |    PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts_us
       |    FROM dedup)
       |),
       |sess AS (
       |  SELECT *, concat(cast(user_id AS string), '_',
       |      cast(session_seq AS string)) AS session_id
       |  FROM (SELECT *, sum(new_sess) OVER (
       |    PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |    FROM gapped)
       |),
       |agg AS (
       |  SELECT session_id, user_id, webtoon_id, episode_id, platform,
       |    country, device, browser, datetime,
       |    min(ts_us) AS start_us, max(ts_us) AS end_us,
       |    count(1) AS n_events,
       |    round(max(value), 2) AS max_value,
       |    max(value_cents) AS max_value_cents,
       |    sum(value_cents) AS sum_value_cents,
       |    cast(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |      AS int) AS seen_enter,
       |    cast(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |      AS int) AS seen_scroll,
       |    cast(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS int) AS seen_complete,
       |    cast(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |      AS int) AS seen_exit
       |  FROM sess
       |  GROUP BY session_id, user_id, webtoon_id, episode_id, platform,
       |    country, device, browser, datetime
       |)
       |SELECT session_id, user_id, webtoon_id, episode_id, platform,
       |  country, device, browser, datetime, start_us, end_us, n_events,
       |  max_value, max_value_cents, sum_value_cents, seen_enter,
       |  seen_scroll, seen_complete, seen_exit,
       |  (end_us - start_us) div 1000 AS duration_ms,
       |  CASE WHEN seen_complete = 1 THEN 'COMPLETE'
       |       WHEN seen_exit = 1 THEN 'EXIT'
       |       WHEN ${asOfUs}L - end_us > ${timeoutUs}L THEN 'TIMEOUT_EXIT'
       |       ELSE 'IN_PROGRESS' END AS session_state,
       |  seen_complete AS is_complete,
       |  cast(CASE WHEN seen_exit = 1 AND seen_complete = 0
       |    THEN 1 ELSE 0 END AS int) AS is_exit
       |FROM agg""".stripMargin

  /** The per-user daily gold as one SELECT over the silver table.
    * Mirrors UserDaily.build: main aggregate + lag-window return
    * intervals + two-level repeat reads, left-joined back. */
  def goldUserDailySelect(silverTable: String): String =
    s"""WITH base AS (
       |  SELECT datetime, user_id,
       |    count(DISTINCT session_id) AS total_sessions,
       |    count(DISTINCT struct(webtoon_id, episode_id))
       |      AS content_items,
       |    count(DISTINCT webtoon_id) AS webtoons_read,
       |    count(DISTINCT CASE WHEN is_complete = 1 THEN session_id END)
       |      AS completed_sessions,
       |    count(DISTINCT CASE WHEN is_exit = 1 THEN session_id END)
       |      AS exit_sessions,
       |    count(1) AS n_rows,
       |    cast(sum(CASE WHEN is_complete = 0 THEN 1 ELSE 0 END)
       |      AS bigint) AS incomplete_rows,
       |    cast(sum(is_complete) AS bigint) AS complete_rows,
       |    sum(duration_ms) AS dur_ms_sum,
       |    sum(max_value_cents) AS mv_cents_sum
       |  FROM $silverTable GROUP BY datetime, user_id
       |),
       |based AS (
       |  SELECT datetime, user_id, total_sessions, content_items,
       |    webtoons_read, completed_sessions, exit_sessions, n_rows,
       |    incomplete_rows,
       |    round((cast(complete_rows AS double) / n_rows) * 10000.0D, 0)
       |      / 10000.0 AS completion_rate,
       |    round((cast(dur_ms_sum AS double) / n_rows) * 100.0D, 0)
       |      / 100.0 AS avg_duration_ms,
       |    round((cast(mv_cents_sum AS double) / (n_rows * 100)) * 100.0D,
       |      0) / 100.0 AS avg_max_value,
       |    CASE WHEN webtoons_read > 0
       |      THEN round((cast(total_sessions AS double) / webtoons_read)
       |        * 100.0D, 0) / 100.0
       |      ELSE 0.0D END AS sessions_per_webtoon
       |  FROM base
       |),
       |iv AS (
       |  SELECT datetime, user_id,
       |    count(interval_us) AS n_iv, sum(interval_us) AS s_iv
       |  FROM (
       |    SELECT datetime, user_id,
       |      greatest(start_us - lag(end_us, 1) OVER (
       |        PARTITION BY user_id ORDER BY start_us, end_us, session_id,
       |        webtoon_id, episode_id, platform, device, browser),
       |        0L) AS interval_us
       |    FROM $silverTable)
       |  GROUP BY datetime, user_id
       |),
       |ivd AS (
       |  SELECT datetime, user_id,
       |    CASE WHEN n_iv > 0
       |      THEN round((s_iv / (1000.0D * n_iv)) * 100.0D, 0) / 100.0
       |      ELSE 0.0D END AS avg_return_interval_ms
       |  FROM iv
       |),
       |rep AS (
       |  SELECT datetime, user_id,
       |    cast(sum(greatest(cnt - 1, 0L)) AS bigint) AS repeat_reads
       |  FROM (SELECT datetime, user_id, webtoon_id, episode_id,
       |      count(1) AS cnt
       |    FROM $silverTable WHERE is_complete = 1
       |    GROUP BY datetime, user_id, webtoon_id, episode_id)
       |  GROUP BY datetime, user_id
       |)
       |SELECT b.datetime, b.user_id, b.total_sessions, b.content_items,
       |  b.webtoons_read, b.completed_sessions, b.exit_sessions, b.n_rows,
       |  b.incomplete_rows, b.completion_rate, b.avg_duration_ms,
       |  b.avg_max_value, b.sessions_per_webtoon,
       |  coalesce(i.avg_return_interval_ms, 0.0D)
       |    AS avg_return_interval_ms,
       |  coalesce(r.repeat_reads, 0L) AS repeat_reads
       |FROM based b
       |LEFT JOIN ivd i ON b.datetime = i.datetime AND b.user_id = i.user_id
       |LEFT JOIN rep r ON b.datetime = r.datetime AND b.user_id = r.user_id
       |""".stripMargin

  /** Episode-base CTE text shared by the episode and webtoon gold SELECTs
    * (the webtoon deepest-episode argmax reads the episode aggregate —
    * the C5 gold→gold dependency, as in the reference). */
  private def episodeBaseCtes(silverTable: String): String =
    s"""ep_base AS (
       |  SELECT datetime, webtoon_id, episode_id,
       |    count(DISTINCT user_id) AS viewers,
       |    count(DISTINCT session_id) AS sessions,
       |    count(DISTINCT CASE WHEN is_complete = 1 THEN session_id END)
       |      AS completed_sessions,
       |    count(1) AS n_rows,
       |    cast(sum(is_complete) AS bigint) AS complete_rows,
       |    cast(sum(is_exit) AS bigint) AS exit_rows,
       |    sum(max_value_cents) AS mv_cents_sum,
       |    cast(sum(CASE WHEN max_value_cents < 4000 THEN 1 ELSE 0 END)
       |      AS bigint) AS v_bucket_0,
       |    cast(sum(CASE WHEN max_value_cents >= 4000
       |      AND max_value_cents < 8000 THEN 1 ELSE 0 END) AS bigint)
       |      AS v_bucket_1,
       |    cast(sum(CASE WHEN max_value_cents >= 8000
       |      AND max_value_cents < 12000 THEN 1 ELSE 0 END) AS bigint)
       |      AS v_bucket_2,
       |    cast(sum(CASE WHEN max_value_cents >= 12000
       |      AND max_value_cents < 16000 THEN 1 ELSE 0 END) AS bigint)
       |      AS v_bucket_3,
       |    cast(sum(CASE WHEN max_value_cents >= 16000 THEN 1 ELSE 0 END)
       |      AS bigint) AS v_bucket_4,
       |    sum(CASE WHEN is_exit = 1 THEN max_value_cents ELSE 0L END)
       |      AS exit_mv_cents_sum
       |  FROM $silverTable GROUP BY datetime, webtoon_id, episode_id
       |),
       |ep_base2 AS (
       |  SELECT datetime, webtoon_id, episode_id, viewers, sessions,
       |    completed_sessions, n_rows, exit_rows,
       |    v_bucket_0, v_bucket_1, v_bucket_2, v_bucket_3, v_bucket_4,
       |    round((cast(complete_rows AS double) / n_rows) * 10000.0D, 0)
       |      / 10000.0 AS completion_rate,
       |    round((cast(exit_rows AS double) / n_rows) * 10000.0D, 0)
       |      / 10000.0 AS exit_rate,
       |    round((cast(mv_cents_sum AS double) / (n_rows * 100)) * 100.0D, 0)
       |      / 100.0 AS avg_max_value,
       |    CASE WHEN exit_rows > 0
       |      THEN round((cast(exit_mv_cents_sum AS double) /
       |        (exit_rows * 100)) * 100.0D, 0) / 100.0
       |      ELSE 0.0D END AS dropoff_value
       |  FROM ep_base
       |)""".stripMargin

  /** The per-episode daily gold as one SELECT over the silver table.
    * Mirrors EpisodeDaily.build (histogram, conditional exit mean, W4
    * lead continuation). */
  def goldEpisodeDailySelect(silverTable: String): String =
    s"""WITH ${episodeBaseCtes(silverTable)},
       |user_eps AS (
       |  SELECT DISTINCT datetime, webtoon_id, user_id, episode_id
       |  FROM $silverTable
       |),
       |cont AS (
       |  SELECT datetime, webtoon_id, episode_id,
       |    count(DISTINCT CASE WHEN next_episode IS NOT NULL THEN user_id
       |      END) AS continuing_users
       |  FROM (
       |    SELECT datetime, webtoon_id, episode_id, user_id,
       |      lead(episode_id, 1) OVER (
       |        PARTITION BY datetime, webtoon_id, user_id
       |        ORDER BY episode_id) AS next_episode
       |    FROM user_eps)
       |  GROUP BY datetime, webtoon_id, episode_id
       |)
       |SELECT e.*, coalesce(c.continuing_users, 0L) AS continuing_users,
       |  CASE WHEN e.viewers > 0
       |    THEN round((cast(coalesce(c.continuing_users, 0L) AS double)
       |      / e.viewers) * 10000.0D, 0) / 10000.0
       |    ELSE 0.0D END AS continuation_rate
       |FROM ep_base2 e
       |LEFT JOIN cont c ON e.datetime = c.datetime
       |  AND e.webtoon_id = c.webtoon_id AND e.episode_id = c.episode_id
       |""".stripMargin

  /** The per-webtoon daily gold as one SELECT over the silver table.
    * Mirrors WebtoonDaily.build, including the C5 gold→gold dependency on
    * the episode aggregate for the deepest-episode argmax. */
  def goldWebtoonDailySelect(silverTable: String): String =
    s"""WITH ${episodeBaseCtes(silverTable)},
       |wt_base AS (
       |  SELECT datetime, webtoon_id,
       |    count(DISTINCT session_id) AS total_sessions,
       |    count(DISTINCT user_id) AS total_users,
       |    count(DISTINCT episode_id) AS episodes_read,
       |    count(1) AS n_rows,
       |    cast(sum(is_complete) AS bigint) AS complete_rows,
       |    cast(sum(is_exit) AS bigint) AS exit_rows,
       |    sum(sum_value_cents) AS value_cents_total,
       |    sum(n_events) AS events_total
       |  FROM $silverTable GROUP BY datetime, webtoon_id
       |),
       |wt_base2 AS (
       |  SELECT datetime, webtoon_id, total_sessions, total_users,
       |    episodes_read, n_rows, events_total,
       |    round((cast(complete_rows AS double) / n_rows) * 10000.0D, 0)
       |      / 10000.0 AS completion_rate,
       |    round((cast(exit_rows AS double) / n_rows) * 10000.0D, 0)
       |      / 10000.0 AS exit_rate,
       |    round((cast(value_cents_total AS double) / (events_total * 100))
       |      * 100.0D, 0) / 100.0 AS avg_event_value
       |  FROM wt_base
       |),
       |deep AS (
       |  SELECT datetime, webtoon_id, episode_id AS deepest_episode_id
       |  FROM (
       |    SELECT datetime, webtoon_id, episode_id,
       |      row_number() OVER (PARTITION BY datetime, webtoon_id
       |        ORDER BY avg_max_value DESC, episode_id) AS rn
       |    FROM ep_base2) WHERE rn = 1
       |),
       |binge AS (
       |  SELECT datetime, webtoon_id,
       |    count(DISTINCT CASE WHEN eps >= 3 THEN user_id END) AS binge_users
       |  FROM (
       |    SELECT datetime, webtoon_id, user_id,
       |      count(DISTINCT episode_id) AS eps
       |    FROM $silverTable GROUP BY datetime, webtoon_id, user_id)
       |  GROUP BY datetime, webtoon_id
       |),
       |wt_users AS (
       |  SELECT DISTINCT datetime, webtoon_id, user_id FROM $silverTable
       |),
       |ret AS (
       |  SELECT date_add(datetime, 1) AS datetime, webtoon_id,
       |    count(1) AS yesterday_users,
       |    count(CASE WHEN user_id IS NOT NULL
       |      AND next_dt = date_add(datetime, 1) THEN 1 END)
       |      AS returned_users
       |  FROM (
       |    SELECT datetime, webtoon_id, user_id,
       |      lead(datetime, 1) OVER (PARTITION BY webtoon_id, user_id
       |        ORDER BY datetime) AS next_dt
       |    FROM wt_users)
       |  GROUP BY date_add(datetime, 1), webtoon_id
       |),
       |ret2 AS (
       |  SELECT *, CASE WHEN yesterday_users > 0
       |    THEN round((cast(returned_users AS double) / yesterday_users)
       |      * 10000.0D, 0) / 10000.0
       |    ELSE 0.0D END AS retention_rate
       |  FROM ret
       |)
       |SELECT w.*,
       |  coalesce(b.binge_users, 0L) AS binge_users,
       |  coalesce(d.deepest_episode_id, 'none') AS deepest_episode_id,
       |  coalesce(r.yesterday_users, 0L) AS yesterday_users,
       |  coalesce(r.returned_users, 0L) AS returned_users,
       |  coalesce(r.retention_rate, 0.0D) AS retention_rate
       |FROM wt_base2 w
       |LEFT JOIN deep d ON w.datetime = d.datetime
       |  AND w.webtoon_id = d.webtoon_id
       |LEFT JOIN binge b ON w.datetime = b.datetime
       |  AND w.webtoon_id = b.webtoon_id
       |LEFT JOIN ret2 r ON w.datetime = r.datetime
       |  AND w.webtoon_id = r.webtoon_id
       |""".stripMargin

  /** The per-country daily gold as one SELECT over the silver table.
    * Mirrors CountryDaily.build (A10 global re-aggregation, J6
    * today-anchored retention). */
  def goldCountryDailySelect(silverTable: String): String =
    s"""WITH base AS (
       |  SELECT datetime, country,
       |    count(DISTINCT struct(user_id, webtoon_id, episode_id))
       |      AS user_content_pairs,
       |    count(1) AS n_rows,
       |    cast(sum(is_complete) AS bigint) AS complete_rows,
       |    sum(sum_value_cents) AS value_cents_total,
       |    sum(n_events) AS events_total
       |  FROM $silverTable GROUP BY datetime, country
       |),
       |base2 AS (
       |  SELECT *,
       |    round((cast(complete_rows AS double) / n_rows) * 10000.0D, 0)
       |      / 10000.0 AS completion_rate,
       |    round((cast(value_cents_total AS double) / (events_total * 100))
       |      * 100.0D, 0) / 100.0 AS avg_event_value
       |  FROM base
       |),
       |globals AS (
       |  SELECT datetime,
       |    round((cast(sum(is_complete) AS double) / count(1)) * 10000.0D, 0)
       |      / 10000.0 AS global_completion_rate,
       |    round((cast(sum(sum_value_cents) AS double) /
       |      (sum(n_events) * 100)) * 100.0D, 0) / 100.0
       |      AS global_avg_event_value
       |  FROM $silverTable GROUP BY datetime
       |),
       |c_users AS (
       |  SELECT datetime, country, user_id,
       |    count(DISTINCT session_id) AS u_sessions
       |  FROM $silverTable
       |  WHERE user_id IS NOT NULL AND session_id IS NOT NULL
       |  GROUP BY datetime, country, user_id
       |),
       |ret AS (
       |  SELECT datetime, country,
       |    cast(sum(u_sessions) AS bigint) AS total_sessions,
       |    count(1) AS active_users,
       |    count(CASE WHEN prev_dt = date_sub(datetime, 1) THEN 1 END)
       |      AS returning_users
       |  FROM (
       |    SELECT *, lag(datetime, 1) OVER (PARTITION BY country, user_id
       |      ORDER BY datetime) AS prev_dt
       |    FROM c_users)
       |  GROUP BY datetime, country
       |),
       |ret2 AS (
       |  SELECT *, active_users - returning_users AS new_users,
       |    CASE WHEN active_users > 0
       |      THEN round((cast(returning_users AS double) / active_users)
       |        * 10000.0D, 0) / 10000.0
       |      ELSE 0.0D END AS returning_ratio
       |  FROM ret
       |)
       |SELECT b.datetime, b.country, b.user_content_pairs, b.n_rows,
       |  b.events_total, b.completion_rate, b.avg_event_value,
       |  g.global_completion_rate, g.global_avg_event_value,
       |  coalesce(r.total_sessions, 0L) AS total_sessions,
       |  coalesce(r.active_users, 0L) AS active_users,
       |  coalesce(r.returning_users, 0L) AS returning_users,
       |  coalesce(r.new_users, 0L) AS new_users,
       |  coalesce(r.returning_ratio, 0.0D) AS returning_ratio,
       |  coalesce(r.active_users, 0L) AS total_users,
       |  CASE WHEN g.global_completion_rate > 0
       |    THEN round((b.completion_rate / g.global_completion_rate)
       |      * 10000.0D, 0) / 10000.0
       |    ELSE 0.0D END AS completion_index
       |FROM base2 b
       |LEFT JOIN globals g ON b.datetime = g.datetime
       |LEFT JOIN ret2 r ON b.datetime = r.datetime
       |  AND b.country = r.country
       |""".stripMargin

  /** The per-(platform, device, browser) daily gold as one SELECT over
    * the silver table. Mirrors PlatformDeviceDaily.build (W5 unbounded
    * gap windows via a WINDOW clause). */
  def goldPlatformDeviceDailySelect(silverTable: String): String =
    s"""WITH pd_base AS (
       |  SELECT datetime, platform, device, browser,
       |    count(DISTINCT session_id) AS total_sessions,
       |    count(DISTINCT user_id) AS total_users,
       |    count(1) AS n_rows,
       |    cast(sum(is_complete) AS bigint) AS complete_rows,
       |    cast(sum(CASE WHEN session_state = 'TIMEOUT_EXIT' THEN 1 ELSE 0
       |      END) AS bigint) AS timeout_rows,
       |    cast(sum(CASE WHEN duration_ms <= 60000 THEN 1 ELSE 0 END)
       |      AS bigint) AS bounce_rows,
       |    sum(duration_ms) AS dur_ms_sum,
       |    sum(sum_value_cents) AS value_cents_total,
       |    sum(n_events) AS events_total
       |  FROM $silverTable GROUP BY datetime, platform, device, browser
       |),
       |pd_base2 AS (
       |  SELECT datetime, platform, device, browser, total_sessions,
       |    total_users, n_rows, events_total,
       |    round((cast(complete_rows AS double) / n_rows) * 10000.0D, 0)
       |      / 10000.0 AS completion_rate,
       |    round((cast(timeout_rows AS double) / n_rows) * 10000.0D, 0)
       |      / 10000.0 AS timeout_rate,
       |    round((cast(bounce_rows AS double) / n_rows) * 10000.0D, 0)
       |      / 10000.0 AS bounce_rate,
       |    round((cast(dur_ms_sum AS double) / n_rows) * 100.0D, 0)
       |      / 100.0 AS avg_duration_ms,
       |    round((cast(value_cents_total AS double) / (events_total * 100))
       |      * 100.0D, 0) / 100.0 AS avg_event_value
       |  FROM pd_base
       |)
       |SELECT *,
       |  round((max(completion_rate) OVER w1 - min(completion_rate) OVER w1)
       |    * 10000.0D, 0) / 10000.0 AS cross_browser_completion_gap,
       |  round((max(avg_duration_ms) OVER w2 - min(avg_duration_ms) OVER w2)
       |    * 100.0D, 0) / 100.0 AS cross_device_duration_gap_ms,
       |  round((max(avg_event_value) OVER w3 - min(avg_event_value) OVER w3)
       |    * 100.0D, 0) / 100.0 AS cross_platform_value_gap
       |FROM pd_base2
       |WINDOW
       |  w1 AS (PARTITION BY datetime, platform, device),
       |  w2 AS (PARTITION BY datetime, platform, browser),
       |  w3 AS (PARTITION BY datetime, device, browser)
       |""".stripMargin
}
