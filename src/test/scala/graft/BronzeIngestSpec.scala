package graft

import graft.streaming.BronzeIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S1–S5 streaming ingest: drives the reference-shaped JSON wire format
  * through a MemoryStream → parse → checkpointed parquet sink, and asserts
  * stream/batch equivalence plus schema-on-write null handling. */
class BronzeIngestSpec extends SparkSpec {
  import spark.implicits._

  private def eventJson(id: Int, user: Int, ts: String,
                        etype: String): String =
    s"""{"event_id":"e$id","user_id":$user,"webtoon_id":"webtoon_1",
       |"episode_id":"ep_1","session_id":"s$user","utimestamptz":"$ts",
       |"local_timestamptz":"$ts","event_type":"$etype","country":"KR",
       |"platform":"ios","device":"phone","browser":"chrome",
       |"scroll_ratio":0.5,"scroll_event_count":3,"dwell_time_ms":1200,
       |"unknown_field":"dropped"}""".stripMargin.replace("\n", "")

  test("stream output equals batch transform of the same input") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      eventJson(1, 1, "2024-01-01T10:00:00+00:00", "enter"),
      eventJson(2, 1, "2024-01-01T10:00:30+00:00", "scroll"),
      eventJson(3, 2, "2024-01-02T09:00:00+00:00", "complete"),
      """{"event_id":"e4","user_id":null,"event_type":"enter"}""")
    val out = tmpDir("bronze-out")
    val ckpt = tmpDir("bronze-ckpt")

    val stream = MemoryStream[String]
    stream.addData(events)
    val q = BronzeIngest.start(
      BronzeIngest.parse(stream.toDF().withColumnRenamed("value", "value")),
      out, ckpt, availableNow = true)
    q.awaitTermination()

    val streamed = spark.read.parquet(out)
    val batch = BronzeIngest.parse(events.toDF("value"))
    assert(streamed.count() == 4)
    // identical row sets modulo column order
    val cols = batch.columns.sorted.map(col).toSeq
    assert(streamed.select(cols: _*).except(batch.select(cols: _*)).isEmpty
      && batch.select(cols: _*).except(streamed.select(cols: _*)).isEmpty)
    // unknown fields dropped, missing fields null, partition date derived
    val r = streamed.filter(col("event_id") === "e3").collect().head
    assert(r.getAs[java.sql.Date]("datetime").toString == "2024-01-02")
    assert(!streamed.columns.contains("unknown_field"))
    assert(streamed.filter(col("event_id") === "e4")
      .collect().head.isNullAt(streamed.columns.indexOf("user_id")))
  }

  test("checkpoint restart does not reprocess drained data") {
    implicit val sqlCtx = spark.sqlContext
    val out = tmpDir("bronze-out2")
    val ckpt = tmpDir("bronze-ckpt2")
    val stream = MemoryStream[String]
    stream.addData(Seq(eventJson(1, 1, "2024-01-01T10:00:00+00:00", "enter")))
    BronzeIngest.start(BronzeIngest.parse(stream.toDF()), out, ckpt,
      availableNow = true).awaitTermination()
    // restart from the same checkpoint with no new data
    BronzeIngest.start(BronzeIngest.parse(stream.toDF()), out, ckpt,
      availableNow = true).awaitTermination()
    assert(spark.read.parquet(out).count() == 1)
  }

  test("kafka source pins the reference's wire config on the built reader") {
    val reader = BronzeIngest.kafkaSource(spark, "broker:9092", "events")
    // No broker in the harness: assert the reader state directly (the
    // classic DataStreamReader keeps format + options in private fields).
    def field[T](name: String): T = {
      val f = reader.getClass.getDeclaredField(name)
      f.setAccessible(true)
      f.get(reader).asInstanceOf[T]
    }
    assert(field[String]("source") == "kafka")
    val opts: Map[String, String] =
      field[org.apache.spark.sql.catalyst.util.CaseInsensitiveMap[String]](
        "extraOptions").toMap
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "events")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("maxOffsetsPerTrigger") == "5000")
    assert(opts("failOnDataLoss") == "false")
    // and the exposed option map is exactly what the reader carries
    assert(BronzeIngest.kafkaOptions("broker:9092", "events").toSet
      .subsetOf(opts.toSet))
  }
}
