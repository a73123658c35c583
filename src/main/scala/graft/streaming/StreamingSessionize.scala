package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization extension (beyond reference parity — the
  * reference tried and retreated to batch, README.md:246-247; SURVEY.md
  * §2.9 marks this the optional extension path).
  *
  * Uses Structured Streaming's native `session_window` with a watermark:
  * state is keyed by (user, session window), windows merge as events
  * arrive, and a session closes — and emits exactly one row — once the
  * watermark passes gap past its last event. This is the
  * streaming-native equivalent of the batch gap sessionization in
  * graft.silver.Sessionize; StreamingSessionizeSpec drives both over the
  * same input and compares.
  */
object StreamingSessionize {

  /** events: must carry event_time TIMESTAMP, user_id, event_type, value.
    * Emits one row per closed session per user. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermark: String = "0 seconds"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(col("user_id"), session_window(col("event_time"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_time")).as("start_time"),
        max(col("event_time")).as("end_time"),
        round(max(col("value")), 2).as("max_value"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .cast("int").as("seen_complete"),
        max(when(col("event_type") === "error", 1).otherwise(0))
          .cast("int").as("seen_exit"))
      .select(col("user_id"), col("session_window.start").as("window_start"),
        col("n_events"), col("start_time"), col("end_time"),
        col("max_value"), col("seen_complete"), col("seen_exit"))
}
