package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adapter from the reference's parsed bronze rows (model/Schemas.RawEvent:
  * producer-assigned session ids, ISO-8601 string timestamps, webtoon dims,
  * scroll measures — SURVEY.md §1.2) to the engine's canonical event shape,
  * so the same silver/gold pipeline runs unchanged on reference data.
  *
  * This is the "switch path": a reference deployment points its Kafka topic
  * at BronzeIngest, adapts here, and calls
  * Sessionize.sessionsFromProvided followed by the gold tables. Mapping
  * decisions:
  *  - timestamps: utimestamptz string → to_timestamp → integer µs
  *    (the engine's time domain); the cast happens here, in silver —
  *    exactly where the reference casts (silver_user_session_events.py:82).
  *  - lifecycle names: enter/scroll/complete/exit → the canonical
  *    view/click/purchase/error vocabulary the session aggregate flags on.
  *  - measure: scroll_ratio → value (+ exact cents), so max_value is
  *    max_scroll_ratio and the value histograms become scroll-depth
  *    histograms, matching the reference's gold semantics.
  */
object ReferenceEvents {

  def adapt(bronze: DataFrame): DataFrame =
    bronze
      // try_to_timestamp: an unparseable wire timestamp yields NULL
      // (quarantined by the not-null cleanse) instead of the ANSI-mode
      // throw that would kill the batch (IngestRobustnessSpec).
      .withColumn("ts_us",
        unix_micros(try_to_timestamp(col("utimestamptz"))))
      .withColumn("datetime",
        to_date(try_to_timestamp(col("utimestamptz"))))
      .withColumn("event_type", expr(
        "CASE event_type WHEN 'enter' THEN 'view' WHEN 'scroll' THEN 'click' " +
          "WHEN 'complete' THEN 'purchase' WHEN 'exit' THEN 'error' " +
          "ELSE event_type END"))
      .withColumn("value", col("scroll_ratio"))
      .withColumn("value_cents",
        expr("cast(round(scroll_ratio * 100, 0) as bigint)"))
      .select("event_id", "user_id", "webtoon_id", "episode_id",
        "session_id", "ts_us", "datetime", "event_type", "value",
        "value_cents", "country", "platform", "device", "browser")
}
