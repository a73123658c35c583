package graft.streaming

import graft.model.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, StreamingQuery, Trigger}

/** S1–S5: Bronze streaming ingest (reference bronze_load_raw_data.py).
  *
  * The stream is deliberately stateless — parse, project, derive the
  * partition date, append — exactly the reference's design (sessionization
  * stays in batch; README.md:53-54 and Issue #2). The same [[parse]]
  * transform serves the batch path, which is what makes the stream/batch
  * equivalence test possible (BronzeIngestSpec).
  *
  * In production the source is Kafka (`readStream.format("kafka")` with
  * maxOffsetsPerTrigger for backpressure); the harness has no broker, so
  * the entry points take any DataFrame with a `value` string column
  * (MemoryStream, file source) — the S2-onward lineage is identical.
  */
object BronzeIngest {

  /** S1 in production: the pinned Kafka source configuration, compiled
    * (not a comment) — the reference subscribes with exactly these
    * options (bronze_load_raw_data.py:65-72): replay from the earliest
    * retained offset on first start, cap each micro-batch at 5000
    * offsets (ingest backpressure: the trigger cadence × this cap is the
    * bronze throughput ceiling), and keep consuming when retention has
    * expired offsets instead of failing the query. One source partition
    * maps to one Kafka partition — parallelism is the topic's partition
    * count. */
  val KafkaStartingOffsets = "earliest"
  val KafkaMaxOffsetsPerTrigger = 5000L
  val KafkaFailOnDataLoss = false

  /** The option set [[kafkaSource]] applies, exposed for tests and for
    * callers composing their own reader. */
  def kafkaOptions(bootstrapServers: String,
                   topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    "startingOffsets" -> KafkaStartingOffsets,
    "maxOffsetsPerTrigger" -> KafkaMaxOffsetsPerTrigger.toString,
    "failOnDataLoss" -> KafkaFailOnDataLoss.toString)

  /** Configured (un-loaded) Kafka reader: `.load()` connects to the
    * broker, so the harness (no broker) builds and inspects the reader
    * while production calls `.load()` and feeds [[parse]]. */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
                  topic: String): DataStreamReader =
    spark.readStream.format("kafka")
      .options(kafkaOptions(bootstrapServers, topic))

  /** S2 + S3: JSON decode against the fixed schema, flatten, derive the
    * `datetime` partition column. Unknown JSON fields drop; missing fields
    * become null (schema-on-write, SURVEY.md §1.4). */
  def parse(raw: DataFrame): DataFrame =
    raw
      .select(from_json(col("value").cast("string"),
        Schemas.rawEventSchema).as("data"))
      .select(col("data.*"))
      // try_to_timestamp, not a bare to_date(string): under ANSI mode
      // an unparseable timestamp string THROWS from the datetime cast —
      // a single garbage wire record would kill the streaming query
      // (IngestRobustnessSpec reproduces it). The try form yields NULL,
      // which the downstream not-null cleanse quarantines.
      .withColumn("datetime",
        to_date(try_to_timestamp(col("utimestamptz"))))

  /** S4: console debug sink (dev only — reference
    * bronze_load_raw_data.py:79-82 runs it as a second concurrent query
    * over the same lineage). */
  def startConsole(parsed: DataFrame): StreamingQuery =
    parsed.writeStream.outputMode("append").format("console").start()

  /** S5: append-only parquet sink with checkpoint recovery. Trigger
    * defaults to the reference's 30 s processing-time cadence;
    * availableNow=true drains everything once (tests, backfills). */
  def start(parsed: DataFrame, outDir: String, checkpointDir: String,
            availableNow: Boolean = false): StreamingQuery = {
    val trigger =
      if (availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime("30 seconds")
    parsed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .partitionBy("datetime")
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
