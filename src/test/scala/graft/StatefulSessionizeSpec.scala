package graft

import graft.streaming.StatefulSessionize
import graft.streaming.StatefulSessionize.SessEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** flatMapGroupsWithState sessionization: same gap semantics as the
  * session_window form — in-batch gap closes immediately, the tail
  * session closes via event-time timeout once the watermark passes. */
class StatefulSessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("custom state machine closes sessions in-batch and on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(offsetSec: Long) =
      new java.sql.Timestamp(t0.getTime + offsetSec * 1000)
    val stream = MemoryStream[SessEvent]
    val q = StatefulSessionize.sessions(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("state_sess").start()

    // batch 1: user 1 has two sessions split by a >30min in-batch gap;
    // user 2 has one open session
    stream.addData(Seq(
      SessEvent(1L, ts(0), "view", 1.0),
      SessEvent(1L, ts(60), "click", 5.0),
      SessEvent(1L, ts(60 + 1900), "purchase", 2.0),
      SessEvent(2L, ts(0), "error", 3.0)))
    q.processAllAvailable()
    // batch 2: a far-future event advances the watermark so the open
    // sessions time out and emit
    stream.addData(Seq(SessEvent(99L, ts(4 * 3600), "view", 0.0)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("state_sess")
      .filter($"user_id" =!= 99L)
      .select("user_id", "n_events", "max_value", "seen_complete",
        "seen_exit")
      .as[(Long, Long, Double, Int, Int)].collect().toSet
    assert(rows == Set(
      (1L, 2L, 5.0, 0, 0),  // closed by the in-batch gap
      (1L, 1L, 2.0, 1, 0),  // closed by timeout
      (2L, 1L, 3.0, 0, 1))) // closed by timeout
  }
}
