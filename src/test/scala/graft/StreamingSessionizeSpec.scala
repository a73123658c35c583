package graft

import graft.streaming.StreamingSessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming session_window sessionization: one row per closed session,
  * gap semantics matching the batch sessionizer. */
class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("session_window closes sessions on the gap and aggregates them") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(offsetSec: Long) =
      new java.sql.Timestamp(t0.getTime + offsetSec * 1000)
    val stream = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    stream.addData(Seq(
      (1L, ts(0), "view", 1.0),
      (1L, ts(60), "click", 5.0),
      (1L, ts(60 + 1900), "purchase", 2.0), // > 30 min gap → second session
      (2L, ts(0), "error", 3.0)))

    val events = stream.toDF()
      .toDF("user_id", "event_time", "event_type", "value")
    val q = StreamingSessionize.sessions(events)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess_out")
      .select("user_id", "n_events", "max_value", "seen_complete",
        "seen_exit")
      .as[(Long, Long, Double, Int, Int)].collect().toSet
    assert(rows == Set(
      (1L, 2L, 5.0, 0, 0),  // first session: view+click
      (1L, 1L, 2.0, 1, 0),  // second session: purchase
      (2L, 1L, 3.0, 0, 1))) // user 2: error
  }

  test("watermark drops late events from closed sessions (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(offsetSec: Long) =
      new java.sql.Timestamp(t0.getTime + offsetSec * 1000)
    val stream = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val events = stream.toDF()
      .toDF("user_id", "event_time", "event_type", "value")
    val q = StreamingSessionize.sessions(events, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    // batch 1: user 1's session + a far-future event that advances the
    // watermark to t0 + 2h50m, well past the session's close point
    stream.addData(Seq(
      (1L, ts(0), "view", 1.0),
      (1L, ts(60), "click", 2.0),
      (99L, ts(3 * 3600), "view", 0.0)))
    q.processAllAvailable()
    // batch 2: an event for user 1 at t0+120s is now LATE (behind the
    // watermark) — it must neither reopen nor extend the closed session
    stream.addData(Seq(
      (1L, ts(120), "click", 9.0),
      (99L, ts(3 * 3600 + 60), "view", 0.0)))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("late_out").filter(col("user_id") === 1L)
      .select("n_events", "max_value")
      .as[(Long, Double)].collect().toSeq
    assert(u1 == Seq((2L, 2.0)), s"late event leaked into session: $u1")
  }
}
