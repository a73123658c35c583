package graft.oracle

/** DuckDB oracle SQL mirroring the Spark pipeline 1:1 (SparkEntry.oracleSql).
  *
  * Rules that make hash-equality achievable across engines:
  *  - All time arithmetic in integer MICROSECONDS (`epoch_us(ts)` here ==
  *    Events.tsUsCol on the Spark side, whatever physical type `ts` has).
  *  - No double survives an aggregation: money is integer cents, durations
  *    integer ms/µs; every double output is round(int/int, n) so both engines
  *    perform one identical IEEE division + round.
  *  - Integer outputs CAST to BIGINT (DuckDB SUM yields HUGEINT otherwise),
  *    flags CAST to INT, matching the Spark types.
  *  - All window orderings are total (ties broken by unique columns).
  */
object Oracles {

  /** Enriched + cleansed events — mirrors graft.ingest.Events. */
  val enrichedCte: String =
    """e0 AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |         CAST(ts AS DATE) AS datetime, event_type, value,
      |         CAST(round(value * 100, 0) AS BIGINT) AS value_cents,
      |         CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND event_type IS NOT NULL AND value IS NOT NULL
      |),
      |enriched AS (
      |  SELECT *,
      |    'webtoon_' || CAST(k % 10 + 1 AS VARCHAR) AS webtoon_id,
      |    'ep_' || CAST(k % 20 + 1 AS VARCHAR) AS episode_id,
      |    CASE CAST(user_id % 5 AS INT) WHEN 0 THEN 'KR' WHEN 1 THEN 'US'
      |      WHEN 2 THEN 'JP' WHEN 3 THEN 'TW' ELSE 'FR' END AS country,
      |    CASE CAST(k % 3 AS INT) WHEN 0 THEN 'ios' WHEN 1 THEN 'android'
      |      ELSE 'web' END AS platform,
      |    CASE CAST(k % 4 AS INT) WHEN 0 THEN 'phone' WHEN 1 THEN 'tablet'
      |      WHEN 2 THEN 'desktop' ELSE 'tv' END AS device,
      |    CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'chrome'
      |      WHEN 1 THEN 'safari' ELSE 'firefox' END AS browser
      |  FROM e0 WHERE k IS NOT NULL
      |)""".stripMargin

  /** D1 keep-latest dedup over `enriched`. */
  val dedupCte: String =
    """dedup AS (
      |  SELECT * EXCLUDE (rn) FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY event_id ORDER BY ts_us DESC) AS rn
      |    FROM enriched) WHERE rn = 1
      |)""".stripMargin

  /** Gap sessionization + silver session aggregate over `src`
    * — mirrors graft.silver.Sessionize. */
  def sessionsCte(src: String): String =
    s"""sa0 AS (
       |  SELECT *, lag(ts_us) OVER (
       |    PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts_us
       |  FROM $src
       |),
       |sa1 AS (
       |  SELECT *, CASE WHEN prev_ts_us IS NULL
       |    OR ts_us - prev_ts_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
       |  FROM sa0
       |),
       |sa2 AS (
       |  SELECT *, SUM(new_sess) OVER (
       |    PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |  FROM sa1
       |),
       |assigned AS (
       |  SELECT *, CAST(user_id AS VARCHAR) || '_' ||
       |    CAST(session_seq AS VARCHAR) AS session_id
       |  FROM sa2
       |),
       |sess0 AS (
       |  SELECT session_id, user_id, webtoon_id, episode_id, platform,
       |         country, device, browser, datetime,
       |         MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       |         CAST(COUNT(*) AS BIGINT) AS n_events,
       |         round(MAX(value), 2) AS max_value,
       |         CAST(MAX(value_cents) AS BIGINT) AS max_value_cents,
       |         CAST(SUM(value_cents) AS BIGINT) AS sum_value_cents,
       |         CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |           AS INT) AS seen_enter,
       |         CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |           AS INT) AS seen_scroll,
       |         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |           AS INT) AS seen_complete,
       |         CAST(MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |           AS INT) AS seen_exit
       |  FROM assigned
       |  GROUP BY 1,2,3,4,5,6,7,8,9
       |),
       |sessions AS (
       |  SELECT *,
       |    (end_us - start_us) // 1000 AS duration_ms,
       |    CASE WHEN seen_complete = 1 THEN 'COMPLETE'
       |         WHEN seen_exit = 1 THEN 'EXIT'
       |         WHEN 1707955200000000 - end_us > 600000000 THEN 'TIMEOUT_EXIT'
       |         ELSE 'IN_PROGRESS' END AS session_state,
       |    seen_complete AS is_complete,
       |    CAST(CASE WHEN seen_exit = 1 AND seen_complete = 0
       |      THEN 1 ELSE 0 END AS INT) AS is_exit
       |  FROM sess0
       |)""".stripMargin

  /** CTE preamble for gold queries (no dedup — gold reads silver, and the
    * silver dedup is a separate materialization, SURVEY.md §3.2/§3.3). */
  private val goldPre = s"WITH $enrichedCte,\n${sessionsCte("enriched")}"

  val silverSessions: String =
    s"""WITH $enrichedCte,
       |$dedupCte,
       |${sessionsCte("dedup")}
       |SELECT * FROM sessions""".stripMargin

  val goldUserDaily: String =
    s"""$goldPre,
       |base AS (
       |  SELECT datetime, user_id,
       |    count(DISTINCT session_id) AS total_sessions,
       |    count(DISTINCT ROW(webtoon_id, episode_id)) AS content_items,
       |    count(DISTINCT webtoon_id) AS webtoons_read,
       |    count(DISTINCT CASE WHEN is_complete = 1 THEN session_id END)
       |      AS completed_sessions,
       |    count(DISTINCT CASE WHEN is_exit = 1 THEN session_id END)
       |      AS exit_sessions,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(CASE WHEN is_complete = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS incomplete_rows,
       |    CAST(SUM(is_complete) AS BIGINT) AS complete_rows,
       |    CAST(SUM(duration_ms) AS BIGINT) AS dur_ms_sum,
       |    CAST(SUM(max_value_cents) AS BIGINT) AS mv_cents_sum
       |  FROM sessions GROUP BY 1, 2
       |),
       |base2 AS (
       |  SELECT datetime, user_id, total_sessions, content_items,
       |    webtoons_read, completed_sessions, exit_sessions, n_rows,
       |    incomplete_rows,
       |    round((complete_rows::DOUBLE / n_rows) * 10000, 0) / 10000.0
       |      AS completion_rate,
       |    round((dur_ms_sum::DOUBLE / n_rows) * 100, 0) / 100.0
       |      AS avg_duration_ms,
       |    round((mv_cents_sum::DOUBLE / (n_rows * 100)) * 100, 0) / 100.0
       |      AS avg_max_value,
       |    CASE WHEN webtoons_read > 0
       |      THEN round((total_sessions::DOUBLE / webtoons_read) * 100, 0)
       |        / 100.0
       |      ELSE 0.0 END AS sessions_per_webtoon
       |  FROM base
       |),
       |iv AS (
       |  SELECT datetime, user_id,
       |    greatest(start_us - lag(end_us) OVER (PARTITION BY user_id
       |      ORDER BY start_us, end_us, session_id, webtoon_id, episode_id,
       |               platform, device, browser), 0) AS interval_us
       |  FROM sessions
       |),
       |iv_agg AS (
       |  SELECT datetime, user_id, count(interval_us) AS n_iv,
       |         SUM(interval_us) AS s_iv
       |  FROM iv GROUP BY 1, 2
       |),
       |iv2 AS (
       |  SELECT datetime, user_id,
       |    CASE WHEN n_iv > 0
       |      THEN round((s_iv / (1000.0 * n_iv)) * 100, 0) / 100.0
       |      ELSE 0.0 END AS avg_return_interval_ms
       |  FROM iv_agg
       |),
       |rp AS (
       |  SELECT datetime, user_id, webtoon_id, episode_id,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM sessions WHERE is_complete = 1 GROUP BY 1, 2, 3, 4
       |),
       |rp_agg AS (
       |  SELECT datetime, user_id,
       |         CAST(SUM(greatest(cnt - 1, 0)) AS BIGINT) AS repeat_reads
       |  FROM rp GROUP BY 1, 2
       |)
       |SELECT b.*,
       |  coalesce(iv2.avg_return_interval_ms, 0.0) AS avg_return_interval_ms,
       |  coalesce(rp_agg.repeat_reads, 0) AS repeat_reads
       |FROM base2 b
       |LEFT JOIN iv2 USING (datetime, user_id)
       |LEFT JOIN rp_agg USING (datetime, user_id)""".stripMargin

  /** Episode base CTEs, shared by the episode and webtoon oracles (the
    * webtoon deepest-episode argmax reads the episode aggregate — C5). */
  private val episodeBaseCtes: String =
    """ep_base AS (
      |  SELECT datetime, webtoon_id, episode_id,
      |    count(DISTINCT user_id) AS viewers,
      |    count(DISTINCT session_id) AS sessions,
      |    count(DISTINCT CASE WHEN is_complete = 1 THEN session_id END)
      |      AS completed_sessions,
      |    CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(is_complete) AS BIGINT) AS complete_rows,
      |    CAST(SUM(is_exit) AS BIGINT) AS exit_rows,
      |    CAST(SUM(max_value_cents) AS BIGINT) AS mv_cents_sum,
      |    CAST(SUM(CASE WHEN max_value_cents < 4000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS v_bucket_0,
      |    CAST(SUM(CASE WHEN max_value_cents >= 4000
      |      AND max_value_cents < 8000 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS v_bucket_1,
      |    CAST(SUM(CASE WHEN max_value_cents >= 8000
      |      AND max_value_cents < 12000 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS v_bucket_2,
      |    CAST(SUM(CASE WHEN max_value_cents >= 12000
      |      AND max_value_cents < 16000 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS v_bucket_3,
      |    CAST(SUM(CASE WHEN max_value_cents >= 16000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS v_bucket_4,
      |    CAST(SUM(CASE WHEN is_exit = 1 THEN max_value_cents ELSE 0 END)
      |      AS BIGINT) AS exit_mv_cents_sum
      |  FROM sessions GROUP BY 1, 2, 3
      |),
      |ep_base2 AS (
      |  SELECT datetime, webtoon_id, episode_id, viewers, sessions,
      |    completed_sessions, n_rows, exit_rows,
      |    v_bucket_0, v_bucket_1, v_bucket_2, v_bucket_3, v_bucket_4,
      |    round((complete_rows::DOUBLE / n_rows) * 10000, 0) / 10000.0
      |      AS completion_rate,
      |    round((exit_rows::DOUBLE / n_rows) * 10000, 0) / 10000.0
      |      AS exit_rate,
      |    round((mv_cents_sum::DOUBLE / (n_rows * 100)) * 100, 0) / 100.0
      |      AS avg_max_value,
      |    CASE WHEN exit_rows > 0
      |      THEN round((exit_mv_cents_sum::DOUBLE / (exit_rows * 100)) * 100,
      |        0) / 100.0
      |      ELSE 0.0 END AS dropoff_value
      |  FROM ep_base
      |)""".stripMargin

  val goldEpisodeDaily: String =
    s"""$goldPre,
       |$episodeBaseCtes,
       |user_eps AS (
       |  SELECT DISTINCT datetime, webtoon_id, user_id, episode_id
       |  FROM sessions
       |),
       |cont0 AS (
       |  SELECT datetime, webtoon_id, episode_id, user_id,
       |    lead(episode_id) OVER (PARTITION BY datetime, webtoon_id, user_id
       |      ORDER BY episode_id) AS next_episode
       |  FROM user_eps
       |),
       |cont AS (
       |  SELECT datetime, webtoon_id, episode_id,
       |    count(DISTINCT CASE WHEN next_episode IS NOT NULL THEN user_id END)
       |      AS continuing_users
       |  FROM cont0 GROUP BY 1, 2, 3
       |)
       |SELECT e.*, coalesce(cont.continuing_users, 0) AS continuing_users,
       |  CASE WHEN e.viewers > 0 THEN
       |    round((coalesce(cont.continuing_users, 0)::DOUBLE / e.viewers)
       |      * 10000, 0) / 10000.0
       |  ELSE 0.0 END AS continuation_rate
       |FROM ep_base2 e
       |LEFT JOIN cont USING (datetime, webtoon_id, episode_id)""".stripMargin

  val goldWebtoonDaily: String =
    s"""$goldPre,
       |$episodeBaseCtes,
       |wt_base AS (
       |  SELECT datetime, webtoon_id,
       |    count(DISTINCT session_id) AS total_sessions,
       |    count(DISTINCT user_id) AS total_users,
       |    count(DISTINCT episode_id) AS episodes_read,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(is_complete) AS BIGINT) AS complete_rows,
       |    CAST(SUM(is_exit) AS BIGINT) AS exit_rows,
       |    CAST(SUM(sum_value_cents) AS BIGINT) AS value_cents_total,
       |    CAST(SUM(n_events) AS BIGINT) AS events_total
       |  FROM sessions GROUP BY 1, 2
       |),
       |wt_base2 AS (
       |  SELECT datetime, webtoon_id, total_sessions, total_users,
       |    episodes_read, n_rows, events_total,
       |    round((complete_rows::DOUBLE / n_rows) * 10000, 0) / 10000.0
       |      AS completion_rate,
       |    round((exit_rows::DOUBLE / n_rows) * 10000, 0) / 10000.0
       |      AS exit_rate,
       |    round((value_cents_total::DOUBLE / (events_total * 100)) * 100, 0)
       |      / 100.0 AS avg_event_value
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
       |binge0 AS (
       |  SELECT datetime, webtoon_id, user_id,
       |         count(DISTINCT episode_id) AS eps
       |  FROM sessions GROUP BY 1, 2, 3
       |),
       |binge AS (
       |  SELECT datetime, webtoon_id,
       |    count(DISTINCT CASE WHEN eps >= 3 THEN user_id END) AS binge_users
       |  FROM binge0 GROUP BY 1, 2
       |),
       |wt_users AS (
       |  SELECT DISTINCT datetime, webtoon_id, user_id FROM sessions
       |),
       |ret AS (
       |  SELECT CAST(y.datetime + 1 AS DATE) AS datetime,
       |         y.webtoon_id AS webtoon_id,
       |         count(DISTINCT y.user_id) AS yesterday_users,
       |         count(DISTINCT CASE WHEN t.user_id IS NOT NULL
       |           THEN y.user_id END) AS returned_users
       |  FROM wt_users y LEFT JOIN wt_users t
       |    ON t.webtoon_id = y.webtoon_id AND t.user_id = y.user_id
       |    AND t.datetime = y.datetime + 1
       |  GROUP BY 1, 2
       |),
       |ret2 AS (
       |  SELECT *, CASE WHEN yesterday_users > 0
       |    THEN round((returned_users::DOUBLE / yesterday_users) * 10000, 0)
       |      / 10000.0
       |    ELSE 0.0 END AS retention_rate
       |  FROM ret
       |)
       |SELECT w.*,
       |  coalesce(deep.deepest_episode_id, 'none') AS deepest_episode_id,
       |  coalesce(binge.binge_users, 0) AS binge_users,
       |  coalesce(ret2.yesterday_users, 0) AS yesterday_users,
       |  coalesce(ret2.returned_users, 0) AS returned_users,
       |  coalesce(ret2.retention_rate, 0.0) AS retention_rate
       |FROM wt_base2 w
       |LEFT JOIN deep USING (datetime, webtoon_id)
       |LEFT JOIN binge USING (datetime, webtoon_id)
       |LEFT JOIN ret2 USING (datetime, webtoon_id)""".stripMargin

  val goldCountryDaily: String =
    s"""$goldPre,
       |base AS (
       |  SELECT datetime, country,
       |    count(DISTINCT session_id) AS total_sessions,
       |    count(DISTINCT user_id) AS total_users,
       |    count(DISTINCT ROW(user_id, webtoon_id, episode_id))
       |      AS user_content_pairs,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(is_complete) AS BIGINT) AS complete_rows,
       |    CAST(SUM(sum_value_cents) AS BIGINT) AS value_cents_total,
       |    CAST(SUM(n_events) AS BIGINT) AS events_total
       |  FROM sessions GROUP BY 1, 2
       |),
       |base2 AS (
       |  SELECT *,
       |    round((complete_rows::DOUBLE / n_rows) * 10000, 0) / 10000.0
       |      AS completion_rate,
       |    round((value_cents_total::DOUBLE / (events_total * 100)) * 100, 0)
       |      / 100.0 AS avg_event_value
       |  FROM base
       |),
       |globals AS (
       |  SELECT datetime,
       |    round((CAST(SUM(complete_rows) AS BIGINT)::DOUBLE /
       |      CAST(SUM(n_rows) AS BIGINT)) * 10000, 0) / 10000.0
       |      AS global_completion_rate,
       |    round((CAST(SUM(value_cents_total) AS BIGINT)::DOUBLE /
       |      (CAST(SUM(events_total) AS BIGINT) * 100)) * 100, 0) / 100.0
       |      AS global_avg_event_value
       |  FROM base GROUP BY 1
       |),
       |c_users AS (
       |  SELECT DISTINCT datetime, country, user_id FROM sessions
       |),
       |ret AS (
       |  SELECT t.datetime AS datetime, t.country AS country,
       |    count(DISTINCT t.user_id) AS active_users,
       |    count(DISTINCT CASE WHEN y.user_id IS NOT NULL
       |      THEN t.user_id END) AS returning_users
       |  FROM c_users t LEFT JOIN c_users y
       |    ON y.country = t.country AND y.user_id = t.user_id
       |    AND y.datetime = t.datetime - 1
       |  GROUP BY 1, 2
       |),
       |ret2 AS (
       |  SELECT *, active_users - returning_users AS new_users,
       |    CASE WHEN active_users > 0
       |      THEN round((returning_users::DOUBLE / active_users) * 10000, 0)
       |        / 10000.0
       |      ELSE 0.0 END AS returning_ratio
       |  FROM ret
       |)
       |SELECT b.datetime, b.country, b.total_sessions, b.total_users,
       |  b.user_content_pairs, b.n_rows, b.events_total, b.completion_rate,
       |  b.avg_event_value, g.global_completion_rate,
       |  g.global_avg_event_value, r.active_users, r.returning_users,
       |  r.new_users, r.returning_ratio,
       |  CASE WHEN g.global_completion_rate > 0
       |    THEN round((b.completion_rate / g.global_completion_rate) * 10000,
       |      0) / 10000.0
       |    ELSE 0.0 END AS completion_index
       |FROM base2 b
       |LEFT JOIN globals g USING (datetime)
       |LEFT JOIN ret2 r USING (datetime, country)""".stripMargin

  val goldPlatformDeviceDaily: String =
    s"""$goldPre,
       |pd_base AS (
       |  SELECT datetime, platform, device, browser,
       |    count(DISTINCT session_id) AS total_sessions,
       |    count(DISTINCT user_id) AS total_users,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(is_complete) AS BIGINT) AS complete_rows,
       |    CAST(SUM(CASE WHEN session_state = 'TIMEOUT_EXIT' THEN 1 ELSE 0
       |      END) AS BIGINT) AS timeout_rows,
       |    CAST(SUM(CASE WHEN duration_ms <= 60000 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS bounce_rows,
       |    CAST(SUM(duration_ms) AS BIGINT) AS dur_ms_sum,
       |    CAST(SUM(sum_value_cents) AS BIGINT) AS value_cents_total,
       |    CAST(SUM(n_events) AS BIGINT) AS events_total
       |  FROM sessions GROUP BY 1, 2, 3, 4
       |),
       |pd_base2 AS (
       |  SELECT datetime, platform, device, browser, total_sessions,
       |    total_users, n_rows, events_total,
       |    round((complete_rows::DOUBLE / n_rows) * 10000, 0) / 10000.0
       |      AS completion_rate,
       |    round((timeout_rows::DOUBLE / n_rows) * 10000, 0) / 10000.0
       |      AS timeout_rate,
       |    round((bounce_rows::DOUBLE / n_rows) * 10000, 0) / 10000.0
       |      AS bounce_rate,
       |    round((dur_ms_sum::DOUBLE / n_rows) * 100, 0) / 100.0
       |      AS avg_duration_ms,
       |    round((value_cents_total::DOUBLE / (events_total * 100)) * 100, 0)
       |      / 100.0 AS avg_event_value
       |  FROM pd_base
       |)
       |SELECT *,
       |  round((MAX(completion_rate) OVER w1 - MIN(completion_rate) OVER w1)
       |    * 10000, 0) / 10000.0 AS cross_browser_completion_gap,
       |  round((MAX(avg_duration_ms) OVER w2 - MIN(avg_duration_ms) OVER w2)
       |    * 100, 0) / 100.0 AS cross_device_duration_gap_ms,
       |  round((MAX(avg_event_value) OVER w3 - MIN(avg_event_value) OVER w3)
       |    * 100, 0) / 100.0 AS cross_platform_value_gap
       |FROM pd_base2
       |WINDOW
       |  w1 AS (PARTITION BY datetime, platform, device),
       |  w2 AS (PARTITION BY datetime, platform, browser),
       |  w3 AS (PARTITION BY datetime, device, browser)""".stripMargin
}
