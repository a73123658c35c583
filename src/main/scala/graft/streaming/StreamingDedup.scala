package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, to_timestamp}

/** Streaming D1: at-least-once sources re-deliver, so the bronze stream
  * needs the same keep-one-per-event_id dedup the batch path runs
  * ([[graft.silver.Dedup.keepLatest]]) — but a stream cannot keep every
  * seen key forever. `dropDuplicatesWithinWatermark` bounds the dedup
  * state by event time: a duplicate arriving within the watermark delay
  * of its first copy is dropped, state older than the watermark is
  * evicted. That is exactly the at-least-once → effectively-once window
  * a redelivering source (Kafka producer retries, replayed offsets)
  * needs, and the state store stays O(keys-per-delay) instead of O(all
  * keys ever) — the property that lets the query run for months at
  * 100 TB/day.
  *
  * Semantics note (why not plain `dropDuplicates`): with unbounded keys
  * the state grows without bound; with `withWatermark` + plain
  * `dropDuplicates` on (event_id, utimestamptz) a re-delivery with a
  * *slightly different* timestamp (producer retry re-stamps) would pass.
  * `dropDuplicatesWithinWatermark` keys the state on event_id alone and
  * uses the watermark only for eviction — the late-redelivery window is
  * explicit and bounded.
  *
  * Batch parity: over a fully-delivered batch frame, the result equals
  * the batch `Dedup.keepLatest` key set (StreamingDedupSpec asserts the
  * stream drains to one row per event_id with the first-seen payload).
  */
object StreamingDedup {

  /** Apply to a PARSED bronze stream (post [[BronzeIngest.parse]]).
    * The wire timestamp is an ISO-8601 STRING (schema-on-write keeps the
    * silver cast downstream), so the event-time column for the watermark
    * is derived here and dropped from the contract. `delay` is the
    * redelivery window: duplicates separated by more than it may both
    * survive (they are separate deliveries by contract at that point). */
  def dedup(parsed: DataFrame, delay: String = "10 minutes"): DataFrame =
    parsed
      .withColumn("event_time", to_timestamp(col("utimestamptz")))
      .withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark(Seq("event_id"))
      .drop("event_time")

  /** Composed stateless-parse → bounded-state dedup bronze lineage. */
  def parseAndDedup(raw: DataFrame, delay: String = "10 minutes")
      : DataFrame =
    dedup(BronzeIngest.parse(raw).filter(col("event_id").isNotNull), delay)
}
