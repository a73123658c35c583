package graft.model

import org.apache.spark.sql.types._

/** Reference-shaped schemas (SURVEY.md §1.2–1.3).
  *
  * RawEvent mirrors the reference's 16-field event
  * (bronze_load_raw_data.py:14-31): timestamps arrive as ISO-8601 STRINGS
  * and are cast only in silver — reproduced here so the streaming ingest
  * (graft.streaming.BronzeIngest) parses the same wire format.
  */
object Schemas {

  val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("user_id", IntegerType),
    StructField("webtoon_id", StringType),
    StructField("episode_id", StringType),
    StructField("session_id", StringType),
    StructField("utimestamptz", StringType),
    StructField("local_timestamptz", StringType),
    StructField("event_type", StringType),
    StructField("country", StringType),
    StructField("platform", StringType),
    StructField("device", StringType),
    StructField("browser", StringType),
    StructField("scroll_ratio", DoubleType),
    StructField("scroll_event_count", IntegerType),
    StructField("dwell_time_ms", LongType)))
}

case class RawEvent(
    event_id: String,
    user_id: Int,
    webtoon_id: String,
    episode_id: String,
    session_id: String,
    utimestamptz: String,
    local_timestamptz: String,
    event_type: String,
    country: String,
    platform: String,
    device: String,
    browser: String,
    scroll_ratio: Double,
    scroll_event_count: Int,
    dwell_time_ms: Long)
