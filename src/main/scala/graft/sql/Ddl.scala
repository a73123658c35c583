package graft.sql

import org.apache.spark.sql.SparkSession

/** S6 as an actual SQL DDL surface: the reference declares its seven
  * tables schema-on-write with `CREATE TABLE ... USING iceberg
  * PARTITIONED BY (days(datetime))` (bronze_load_raw_data.py:41-63,
  * silver_user_session_events.py:22-50, gold_*_metrics.py:22-52); graft
  * re-expresses each as Spark parquet-source DDL so a user porting the
  * reference's SQL has a direct entry point instead of relying on the
  * writers' implicit table creation.
  *
  * Mapping notes:
  *  - `USING iceberg` → `USING parquet`: no table format in this engine
  *    (SURVEY.md §7.3); writers pair with [[graft.silver.MergeUpsert]]'s
  *    staged-swap commit for the crash-safety Iceberg provides natively.
  *  - `PARTITIONED BY (days(datetime))` → `PARTITIONED BY (datetime)`:
  *    the day transform of a DATE column is the column itself, so the
  *    physical layout (one directory per day) is identical.
  *  - Catalog namespaces (`iceberg.bronze.` …) → flat names with a
  *    layer prefix; `LOCATION` anchors each table under the caller's
  *    warehouse dir, which is what makes the DDL runnable against the
  *    in-memory catalog AND a Hive metastore unchanged.
  */
object Ddl {

  /** Table name → column/partition clause, verbatim column lists from
    * the reference DDLs. */
  private val tables: Seq[(String, String)] = Seq(
    // bronze_load_raw_data.py:42-62
    "bronze_webtoon_user_events_raw" ->
      """(event_id STRING, user_id INT, webtoon_id STRING,
        | episode_id STRING, session_id STRING, utimestamptz STRING,
        | local_timestamptz STRING, event_type STRING, country STRING,
        | platform STRING, device STRING, browser STRING,
        | network_type STRING, scroll_ratio DOUBLE,
        | scroll_event_count INT, dwell_time_ms BIGINT, datetime DATE)""",
    // silver_user_session_events.py:23-49
    "silver_webtoon_user_session_events" ->
      """(session_id STRING, user_id INT, webtoon_id STRING,
        | episode_id STRING, platform STRING, country STRING,
        | device STRING, browser STRING, datetime DATE,
        | start_time TIMESTAMP, end_time TIMESTAMP, duration_ms BIGINT,
        | max_scroll_ratio DOUBLE, seen_enter BOOLEAN,
        | seen_scroll BOOLEAN, seen_complete BOOLEAN, seen_exit BOOLEAN,
        | session_state STRING, is_complete INT, is_exit INT)""",
    // gold_user_daily_metrics.py:23-41
    "gold_user_daily_metrics" ->
      """(datetime DATE, user_id INT, total_episode_sessions BIGINT,
        | complete_sessions BIGINT, exit_sessions BIGINT,
        | incomplete_sessions BIGINT, avg_scroll_ratio DOUBLE,
        | avg_duration_ms DOUBLE, bounce_ratio DOUBLE,
        | distinct_episode_views BIGINT,
        | distinct_episode_completes BIGINT, completion_rate DOUBLE,
        | exit_rate DOUBLE, multi_episode_read_flag INT,
        | avg_return_interval_sec DOUBLE,
        | repeat_episode_complete_count BIGINT)""",
    // gold_webtoon_episode_daily_metrics.py:24-50
    "gold_webtoon_episode_daily_metrics" ->
      """(datetime DATE, webtoon_id STRING, episode_id STRING,
        | total_sessions BIGINT, complete_sessions BIGINT,
        | exit_sessions BIGINT, incomplete_sessions BIGINT,
        | unique_users BIGINT, unique_complete_users BIGINT,
        | unique_exit_users BIGINT, avg_scroll_ratio DOUBLE,
        | avg_duration_ms DOUBLE, completion_rate DOUBLE,
        | exit_rate DOUBLE, timeout_exit_rate DOUBLE,
        | bounce_ratio DOUBLE, scroll_dropoff_point DOUBLE,
        | scroll_bucket_0_20 BIGINT, scroll_bucket_20_40 BIGINT,
        | scroll_bucket_40_60 BIGINT, scroll_bucket_60_80 BIGINT,
        | scroll_bucket_80_100 BIGINT, continued_user_count BIGINT,
        | episode_attractiveness_index DOUBLE)""",
    // gold_webtoon_daily_metrics.py:24-48
    "gold_webtoon_daily_metrics" ->
      """(datetime DATE, webtoon_id STRING,
        | deepest_episode_reached STRING, total_sessions BIGINT,
        | complete_sessions BIGINT, exit_sessions BIGINT,
        | incomplete_sessions BIGINT, unique_users BIGINT,
        | unique_complete_users BIGINT, unique_exit_users BIGINT,
        | avg_scroll_ratio DOUBLE, avg_duration_ms DOUBLE,
        | completion_rate DOUBLE, exit_rate DOUBLE,
        | timeout_exit_rate DOUBLE, bounce_ratio DOUBLE,
        | scroll_dropoff_point DOUBLE, binge_read_ratio DOUBLE,
        | webtoon_retention_rate DOUBLE)""",
    // gold_country_daily_metrics.py:24-49
    "gold_country_daily_metrics" ->
      """(datetime DATE, country STRING, total_sessions BIGINT,
        | unique_users BIGINT, sessions_per_user DOUBLE,
        | completion_rate DOUBLE, exit_rate DOUBLE,
        | timeout_exit_rate DOUBLE, avg_scroll_ratio DOUBLE,
        | avg_duration_ms DOUBLE, bounce_ratio DOUBLE,
        | active_user_depth DOUBLE, returning_users BIGINT,
        | return_user_ratio DOUBLE, new_users BIGINT,
        | new_user_ratio DOUBLE, completion_rate_gap_vs_global DOUBLE,
        | scroll_depth_index DOUBLE, avg_duration_index DOUBLE,
        | completion_exit_ratio DOUBLE)""",
    // gold_platform_device_daily_metrics.py:23-43
    "gold_platform_device_daily_metrics" ->
      """(datetime DATE, platform STRING, device STRING, browser STRING,
        | total_sessions BIGINT, unique_users BIGINT,
        | sessions_per_user DOUBLE, completion_rate DOUBLE,
        | exit_rate DOUBLE, timeout_exit_rate DOUBLE,
        | avg_scroll_ratio DOUBLE, avg_duration_ms DOUBLE,
        | bounce_ratio DOUBLE, cross_browser_completion_gap DOUBLE,
        | cross_device_duration_gap DOUBLE,
        | cross_platform_scroll_gap DOUBLE)""")

  /** The seven CREATE TABLE statements, anchored under `warehouseDir`.
    * Idempotent (IF NOT EXISTS) like the reference's. */
  def statements(warehouseDir: String): Map[String, String] =
    tables.map { case (name, cols) =>
      name ->
        s"""CREATE TABLE IF NOT EXISTS $name
           |${cols.stripMargin}
           |USING parquet
           |PARTITIONED BY (datetime)
           |LOCATION '$warehouseDir/$name'""".stripMargin
    }.toMap

  /** Execute all seven DDLs against the session catalog. */
  def createAll(spark: SparkSession, warehouseDir: String): Unit =
    statements(warehouseDir).values.foreach(spark.sql(_))

  /** Declared table names, bronze → silver → gold order. */
  def tableNames: Seq[String] = tables.map(_._1)
}
