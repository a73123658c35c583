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
}
