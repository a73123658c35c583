package graft

import graft.streaming.StreamingAnomaly
import graft.streaming.StreamingAnomaly.HourBucket
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming anomaly scoring: bounded 24-count state per event type,
  * and streamed output == the batch anomalyHourly query row-for-row on
  * the same buckets (the streamed-equals-batch pattern of
  * StreamingDedupSpec / SilverLoopSpec). */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  // The OpsR3Spec planted-spike fixture: 30 calm alternating buckets
  // then a 300-event spike, written as raw events for the batch query.
  private def fixture(dir: String): Seq[HourBucket] = {
    val rows = (0 until 30).flatMap { h =>
      val n = if (h % 2 == 0) 10 else 12
      (0 until n).map(i => (h.toLong * 100 + i, h, "click"))
    } ++ (0 until 300).map(i => (9000L + i, 30, "click"))
    rows.toDF("event_id", "h", "event_type")
      .withColumn("ts", expr(
        "timestamp_micros(cast(h as bigint) * 3600000000)"))
      .withColumn("user_id", col("event_id") % 7)
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .drop("h")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    (0 until 31).map { h =>
      HourBucket("click", h.toLong * 3600000000L,
        if (h == 30) 300L else if (h % 2 == 0) 10L else 12L)
    }
  }

  test("streamed z-scores == batch anomalyHourly across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("stream-anomaly")
    val buckets = fixture(dir)
    val batch = graft.ops.EventOps.anomalyHourly(spark, dir)
      .select("event_type", "window_start_us", "n_events", "n_trail",
        "z_score", "is_anomaly")
      .as[(String, Long, Long, Long, Double, Int)].collect().toSet

    val stream = MemoryStream[HourBucket]
    val q = StreamingAnomaly.scores(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_anomaly").start()
    // three uneven micro-batches: state must carry the ring across them
    stream.addData(buckets.take(10))
    q.processAllAvailable()
    stream.addData(buckets.slice(10, 27))
    q.processAllAvailable()
    stream.addData(buckets.drop(27))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_anomaly")
      .as[(String, Long, Long, Long, Double, Int)].collect().toSet
    assert(streamed == batch,
      s"missing ${(batch -- streamed).size}, " +
        s"extra ${(streamed -- batch).size}")
    // the spike flagged, and exactly once
    assert(streamed.count(_._6 == 1) == 1)
  }

  test("state stays bounded at the 24-count ring") {
    // 200 buckets for one key: the fold must keep only the last 24
    var trail = Vector.empty[Long]
    for (i <- 0 until 200) {
      val (_, _) = StreamingAnomaly.score(i.toLong, trail)
      trail = (trail :+ i.toLong).takeRight(StreamingAnomaly.Trail)
    }
    assert(trail.length == StreamingAnomaly.Trail)
    assert(trail == (176 until 200).map(_.toLong).toVector)
  }
}
