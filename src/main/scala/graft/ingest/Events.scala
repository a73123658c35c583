package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Adapter from the harness `events` table (TESTDATA.md: event_id, ts[ns],
  * user_id, event_type, value, props) to the reference-shaped event stream.
  *
  * The reference's raw event (SURVEY.md §1.2; reference
  * src/kafka/faker_producer.py:56-84) carries user/webtoon/episode/session ids
  * plus country/platform/device/browser dims and scroll/dwell measures. The
  * harness `events` table has none of those, so we derive them
  * deterministically from (user_id, event_id, props.k) — every derivation is
  * mirrored 1:1 in graft.oracle.Oracles so DuckDB can verify every downstream
  * operator bit-for-bit.
  *
  * Time domain note: all time arithmetic happens in integer MICROSECONDS
  * ([[tsUsCol]] here == `epoch_us(ts)` in the oracle). The harness has
  * shipped `ts` under two physical encodings across rounds — parquet
  * timestamp[ns] (a nanosecond long under
  * spark.sql.legacy.parquet.nanosAsLong) and parquet timestamp[us] (read
  * as TIMESTAMP_NTZ) — so the epoch derivation is type-adaptive rather
  * than hard-coded to either.
  *
  * Float policy: doubles never survive an aggregation. Money-like `value` is
  * carried as integer cents (`value_cents`); averages downstream are computed
  * as round(sum_int / count, n) so both engines produce identical doubles.
  */
object Events {

  /** 30-minute inactivity gap between events of one user ⇒ new session. */
  val SessionGapUs: Long = 1800L * 1000000L

  /** Deterministic "as of" instant for TIMEOUT_EXIT classification
    * (2024-02-15T00:00:00Z). The reference uses current_timestamp()
    * (silver_user_session_events.py:135) — non-deterministic; we parameterize
    * (SURVEY.md §7.3 P9) and pin this value for the harness queries. */
  val AsOfUs: Long = 1707955200000000L

  /** Session considered timed out 600 s after its last event (reference
    * silver_user_session_events.py:135-136). */
  val TimeoutUs: Long = 600L * 1000000L

  /** Raw scan. Filter/column pushdown reaches the parquet reader (S8). */
  def raw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** Canonical epoch-microsecond expression for the raw `ts` column,
    * adaptive to its physical type:
    *  - LongType: nanosecond epoch (timestamp[ns] parquet under the
    *    nanosAsLong read) → `div 1000`;
    *  - TIMESTAMP: `unix_micros` directly;
    *  - TIMESTAMP_NTZ (timestamp[us] parquet, the current harness
    *    encoding): cast to TIMESTAMP first. Every session entry point
    *    pins spark.sql.session.timeZone=UTC, so the cast interprets the
    *    naive wall clock as UTC — bit-identical to DuckDB's
    *    `epoch_us(ts)` on the same file.
    */
  def tsUsCol(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType      => expr("ts div 1000")
    case TimestampType => unix_micros(col("ts"))
    case _             => unix_micros(col("ts").cast(TimestampType))
  }

  /** [[tsUsCol]] appended as the standard `ts_us` column. */
  def withTsUs(df: DataFrame): DataFrame =
    df.withColumn("ts_us", tsUsCol(df))

  /** Bronze-analog: typed, dimension-enriched events (S2/S3/P1 analogues).
    * Every column codegen-friendly builtins only. The harness events table
    * is a single parquet file (one input split), so the regexp/date parse
    * in [[enrich]] would run on one core for every downstream silver/gold
    * query — Layout.spread fans the scan out first (on a real cluster with
    * many files the same call is a cheap no-op-sized shuffle). */
  def enriched(spark: SparkSession, sfDir: String): DataFrame =
    // Round-robin spread, DELIBERATELY not keyed (r17 measured both): a
    // user_id-keyed spread removes one exchange and its pre-repartition
    // sort, and a warm same-JVM A/B favors it (sessions 0.96 → 0.55 s at
    // sf0.1) — but the partitioning then survives the golds' silver
    // localCheckpoint, every downstream branch aggregate/join reuses it,
    // and the resulting exchange-free plans disable AQE's coalescing and
    // broadcast-join conversion: more live stages, more codegen, and a
    // fresh-JVM min-of-3 regresses (gold_user_daily 2.14 → 2.71 s solo
    // bench A/B). Consumers that DON'T checkpoint (the one-shot distinct
    // ops in EventOps) use Layout.spreadBy(user_id) and keep the win —
    // see OPTIMIZATION_r17.md §silver-family.
    enrich(graft.util.Layout.spread(raw(spark, sfDir)))

  /** Pure form of [[enriched]] for already-loaded raw events (incremental
    * runtime, tests). */
  def enrich(raw: DataFrame): DataFrame =
    withTsUs(raw)
      .withColumn("datetime", to_date(timestamp_micros(col("ts_us"))))
      // regexp_extract returns "" (not NULL) on no-match, and under
      // ANSI mode ''::int THROWS — one malformed props record would
      // kill the whole job (IngestRobustnessSpec reproduces it). Map
      // no-match to NULL first; the matched group is all-digits, so the
      // cast can never throw on a non-empty value. Cleanse then drops
      // the NULL-k row: poison records quarantine instead of crashing.
      .withColumn("k",
        nullif(regexp_extract(col("props"), "\"k\": (\\d+)", 1), lit(""))
          .cast("int"))
      .withColumn("value_cents", expr("try_cast(round(value * 100, 0) as bigint)"))
      .withColumn("webtoon_id",
        concat(lit("webtoon_"), (col("k") % 10 + 1).cast("string")))
      .withColumn("episode_id",
        concat(lit("ep_"), (col("k") % 20 + 1).cast("string")))
      .withColumn("country", expr(
        "CASE CAST(user_id % 5 AS INT) WHEN 0 THEN 'KR' WHEN 1 THEN 'US' " +
          "WHEN 2 THEN 'JP' WHEN 3 THEN 'TW' ELSE 'FR' END"))
      .withColumn("platform", expr(
        "CASE CAST(k % 3 AS INT) WHEN 0 THEN 'ios' WHEN 1 THEN 'android' " +
          "ELSE 'web' END"))
      .withColumn("device", expr(
        "CASE CAST(k % 4 AS INT) WHEN 0 THEN 'phone' WHEN 1 THEN 'tablet' " +
          "WHEN 2 THEN 'desktop' ELSE 'tv' END"))
      .withColumn("browser", expr(
        "CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'chrome' " +
          "WHEN 1 THEN 'safari' ELSE 'firefox' END"))

  /** P2 not-null conjunction + P3 default fill (reference
    * silver_user_session_events.py:95-108). */
  def cleansed(spark: SparkSession, sfDir: String): DataFrame =
    cleanse(enriched(spark, sfDir))

  /** Pure form of [[cleansed]] over an enriched frame. Money validity
    * is gated on the DERIVED column: `value_cents IS NOT NULL`
    * quarantines every input `value` with no valid cents — NULL, NaN,
    * ±Infinity, AND finite doubles past the Long range (|v| ≳ 9.2e16,
    * where try_cast overflows to NULL) — in one predicate. Enumerating
    * bad inputs (the previous NaN/±Inf list) missed the overflow class:
    * those rows kept a non-null `value` but a NULL `value_cents`,
    * exactly the silent-mass-drop the filter exists to close
    * (IngestRobustnessSpec pins all four poison classes). The oracle's
    * e0 matches: harness data is finite and in-range, so on it this
    * predicate equals `value IS NOT NULL`. */
  def cleanse(enriched: DataFrame): DataFrame =
    enriched
      .filter(cleanseChecks.map(_._2).reduce(_ && _))
      .na.fill(Map(
        "platform" -> "UNKNOWN", "device" -> "UNKNOWN",
        "browser" -> "UNKNOWN", "country" -> "UNKNOWN"))

  /** The cleanse gate's checks — name (the dq_expectations naming
    * style) → pass predicate — in gating order. Single source of truth
    * for [[cleanse]] (conjunction of passes) and [[rejects]] (rows
    * failing any, tagged with what failed): the two MUST partition the
    * input exactly, or the quarantine under-reports drops
    * (QuarantineSpec pins `cleanse ⊎ rejects == input`). Every
    * predicate is an IS NOT NULL, so none is itself null-valued and
    * the complement is literally `NOT all-pass`. */
  def cleanseChecks: Seq[(String, Column)] = Seq(
    "not_null_user_id" -> col("user_id").isNotNull,
    "not_null_ts" -> col("ts").isNotNull,
    "not_null_event_type" -> col("event_type").isNotNull,
    "valid_value_cents" -> col("value_cents").isNotNull,
    "valid_props_k" -> col("k").isNotNull)

  /** The quarantine complement of [[cleanse]]: every enriched row the
    * gate drops, carrying `reject_reasons` (ALL failed checks, gating
    * order) and `reject_reason` (the first — each dropped row lands
    * under exactly ONE primary reason, so per-reason quarantine counts
    * sum to the drop count). At 100 TB silent drops are unauditable —
    * a producer emitting garbage shows up here with WHY, instead of as
    * a row-count discrepancy three dashboards downstream (the
    * reference's cleanse at silver_user_session_events.py:95-108 has
    * the same blind spot). */
  def rejects(enriched: DataFrame): DataFrame =
    enriched
      .withColumn("reject_reasons",
        filter(
          array(cleanseChecks.map { case (n, p) =>
            when(!p, lit(n))
          }: _*),
          x => x.isNotNull))
      .filter(size(col("reject_reasons")) > 0)
      .withColumn("reject_reason", get(col("reject_reasons"), lit(0)))
}
