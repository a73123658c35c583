package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Bounded-state streaming dedup: redeliveries inside the watermark
  * window collapse to the first-seen copy; the drained stream matches
  * the batch one-row-per-event_id contract. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def eventJson(id: String, ts: String, etype: String): String =
    s"""{"event_id":"$id","user_id":1,"webtoon_id":"w1",
       |"episode_id":"ep_1","session_id":"s1","utimestamptz":"$ts",
       |"local_timestamptz":"$ts","event_type":"$etype","country":"KR",
       |"platform":"ios","device":"phone","browser":"chrome",
       |"scroll_ratio":0.5,"scroll_event_count":3,"dwell_time_ms":100}"""
      .stripMargin.replace("\n", "")

  test("redelivered events inside the watermark collapse to one row") {
    implicit val sqlCtx = spark.sqlContext
    val out = tmpDir("sdedup-out")
    val ckpt = tmpDir("sdedup-ckpt")
    val stream = MemoryStream[String]
    stream.addData(Seq(
      eventJson("e1", "2024-01-01T10:00:00+00:00", "enter"),
      // producer-retry redelivery: same id, re-stamped 30 s later —
      // plain dropDuplicates(id, ts) would pass BOTH copies
      eventJson("e1", "2024-01-01T10:00:30+00:00", "enter"),
      eventJson("e2", "2024-01-01T10:01:00+00:00", "scroll"),
      eventJson("e2", "2024-01-01T10:01:00+00:00", "scroll"),
      eventJson("e3", "2024-01-01T10:02:00+00:00", "complete")))
    val q = StreamingDedup.parseAndDedup(stream.toDF())
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet")
      .option("path", out)
      .start()
    q.awaitTermination()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 3, "one row per event_id")
    assert(rows.select("event_id").distinct().count() == 3)
    // first-seen copy wins for the re-stamped redelivery
    val e1 = rows.filter(col("event_id") === "e1").collect().head
    assert(e1.getAs[String]("utimestamptz") == "2024-01-01T10:00:00+00:00")
  }
}
