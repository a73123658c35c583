package graft

import graft.silver.{Dedup, Sessionize}
import org.apache.spark.sql.functions._

/** Unit semantics for D1 dedup, gap sessionization, and the P8/P9 state
  * machine with an injected asOf (deterministic TIMEOUT_EXIT). */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val us = 1000000L // 1 second in µs

  // (event_id, user_id, ts_us, event_type, value)
  private def mkEvents(rows: Seq[(Long, Long, Long, String, Double)]) =
    rows.toDF("event_id", "user_id", "ts_us", "event_type", "value")
      .withColumn("datetime", to_date(timestamp_micros(col("ts_us"))))
      .withColumn("value_cents",
        expr("cast(round(value * 100, 0) as bigint)"))
      .withColumn("webtoon_id", lit("w1"))
      .withColumn("episode_id", lit("e1"))
      .withColumn("country", lit("KR"))
      .withColumn("platform", lit("ios"))
      .withColumn("device", lit("phone"))
      .withColumn("browser", lit("chrome"))

  test("gap sessionization splits on 30-minute inactivity") {
    val t0 = 1700000000L * 1000000L
    val df = mkEvents(Seq(
      (1L, 7L, t0, "view", 1.0),
      (2L, 7L, t0 + 60 * us, "click", 2.0),          // same session
      (3L, 7L, t0 + 1900 * 1000000L, "view", 3.0),   // > 30 min gap → new
      (4L, 8L, t0, "view", 4.0)))                    // other user
    val sess = Sessionize.assignSessions(df)
      .select("event_id", "session_id").as[(Long, String)].collect().toMap
    assert(sess(1L) == "7_1" && sess(2L) == "7_1")
    assert(sess(3L) == "7_2")
    assert(sess(4L) == "8_1")
  }

  test("state machine: COMPLETE > EXIT > TIMEOUT_EXIT > IN_PROGRESS") {
    val t0 = 1700000000L * 1000000L
    val asOf = t0 + 700 * us // 700 s after events
    val df = mkEvents(Seq(
      (1L, 1L, t0, "purchase", 1.0),                 // COMPLETE
      (2L, 2L, t0, "error", 1.0),                    // EXIT
      (3L, 3L, t0, "view", 1.0),                     // 700s ago → TIMEOUT
      (4L, 4L, t0 + 600 * us, "view", 1.0)))         // 100s ago → IN_PROGRESS
    val out = Sessionize.sessions(df, asOfUs = asOf)
      .select("user_id", "session_state", "is_complete", "is_exit")
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == "COMPLETE" && out(1L)._3 == 1 && out(1L)._4 == 0)
    assert(out(2L)._2 == "EXIT" && out(2L)._3 == 0 && out(2L)._4 == 1)
    assert(out(3L)._2 == "TIMEOUT_EXIT")
    assert(out(4L)._2 == "IN_PROGRESS")
  }

  test("complete wins over exit within one session") {
    val t0 = 1700000000L * 1000000L
    val df = mkEvents(Seq(
      (1L, 1L, t0, "error", 1.0),
      (2L, 1L, t0 + us, "purchase", 1.0)))
    val out = Sessionize.sessions(df, asOfUs = t0)
      .select("session_state", "is_exit").as[(String, Int)].collect()
    assert(out.toSeq == Seq(("COMPLETE", 0)))
  }

  test("dedup keeps the latest row per event_id") {
    val t0 = 1700000000L * 1000000L
    val df = mkEvents(Seq(
      (1L, 1L, t0, "view", 1.0),
      (1L, 1L, t0 + us, "click", 2.0), // same id, later → kept
      (2L, 1L, t0, "view", 3.0)))
    val out = Dedup.keepLatest(df)
      .select("event_id", "event_type").as[(Long, String)].collect().toMap
    assert(out.size == 2 && out(1L) == "click" && out(2L) == "view")
  }

  test("sessions aggregate: duration, flags, max measure") {
    val t0 = 1700000000L * 1000000L
    val df = mkEvents(Seq(
      (1L, 1L, t0, "view", 1.5),
      (2L, 1L, t0 + 5 * us, "click", 9.25),
      (3L, 1L, t0 + 10 * us, "purchase", 4.0)))
    val row = Sessionize.sessions(df, asOfUs = t0).collect().head
    assert(row.getAs[Long]("duration_ms") == 10000L)
    assert(row.getAs[Long]("n_events") == 3L)
    assert(row.getAs[Double]("max_value") == 9.25)
    assert(row.getAs[Long]("max_value_cents") == 925L)
    assert(row.getAs[Int]("seen_enter") == 1)
    assert(row.getAs[Int]("seen_scroll") == 1)
    assert(row.getAs[Int]("seen_complete") == 1)
    assert(row.getAs[Int]("seen_exit") == 0)
  }
}
