package graft

import graft.ingest.Events
import graft.streaming.BronzeIngest
import org.apache.spark.sql.functions._

/** Malformed-input resilience: the cleansing boundary must DROP bad
  * rows, never throw — at 100 TB some producer always emits garbage,
  * and one poison record must not kill a nightly job. */
class IngestRobustnessSpec extends SparkSpec {
  import spark.implicits._

  test("cleanse drops rows with malformed or missing props/fields") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rows = spark.createDataFrame(
      java.util.Arrays.asList(
        // good row
        Row(1L, t0, 10L, "view", 1.5, """{"k": 7}"""),
        // props not JSON → k null → dropped
        Row(2L, t0, 10L, "view", 1.5, "not json at all"),
        // props JSON but missing k → dropped
        Row(3L, t0, 10L, "view", 1.5, "{}"),
        // null value → dropped
        Row(4L, t0, 10L, "view", null, """{"k": 7}"""),
        // null event_type → dropped
        Row(5L, t0, 10L, null, 1.5, """{"k": 7}"""),
        // non-finite values → dropped (their cents are uncomputable; a
        // plain ANSI cast would throw, and NULL cents would silently
        // drop mass from downstream sums)
        Row(6L, t0, 10L, "view", Double.NaN, """{"k": 7}"""),
        Row(7L, t0, 10L, "view", Double.PositiveInfinity, """{"k": 7}"""),
        // finite but past Long range → value_cents overflows to NULL
        // under try_cast — same silent-mass-drop class, same fate
        Row(8L, t0, 10L, "view", 1.0e18, """{"k": 7}"""),
        Row(9L, t0, 10L, "view", -1.0e18, """{"k": 7}""")),
      schema)
    val cleansed = Events.cleanse(Events.enrich(rows))
    val kept = cleansed.select("event_id").collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(1L),
      s"expected only the good row to survive, got ${kept.mkString(",")}")
    // Derived columns on the survivor are well-formed.
    val r = cleansed.head()
    assert(r.getAs[String]("webtoon_id") == "webtoon_8") // k=7 → 7%10+1
    assert(r.getAs[String]("episode_id") == "ep_8")
  }

  test("bronze wire parse tolerates malformed lines without throwing") {
    val good =
      """{"event_id":"e1","user_id":1,"webtoon_id":"webtoon_1",
        |"episode_id":"ep_1","session_id":"s1",
        |"utimestamptz":"2024-01-01T10:00:00+00:00",
        |"local_timestamptz":"2024-01-01T10:00:00+00:00",
        |"event_type":"enter","country":"KR","platform":"ios",
        |"device":"phone","browser":"chrome","scroll_ratio":0.0,
        |"scroll_event_count":1,"dwell_time_ms":1000}"""
        .stripMargin.replace("\n", "")
    val parsed = BronzeIngest.parse(
      Seq(good, "garbage {{", "", "[1,2,3]").toDF("value"))
    val rows = parsed.collect()
    assert(rows.length == 4) // nothing thrown, nothing silently lost
    assert(rows.count(_.getAs[String]("event_id") != null) == 1)
    // The malformed lines surface as all-null records a downstream
    // not-null cleanse drops — poison stays quarantined, not fatal.
  }

  test("valid JSON with a garbage timestamp is quarantined, not fatal") {
    // Well-formed wire record whose utimestamptz is unparseable: the
    // date/timestamp derivations must yield NULL (dropped downstream),
    // never throw under ANSI mode.
    val bad =
      """{"event_id":"e9","user_id":1,"webtoon_id":"webtoon_1",
        |"episode_id":"ep_1","session_id":"s1","utimestamptz":"banana",
        |"local_timestamptz":"banana","event_type":"enter","country":"KR",
        |"platform":"ios","device":"phone","browser":"chrome",
        |"scroll_ratio":0.0,"scroll_event_count":1,"dwell_time_ms":1}"""
        .stripMargin.replace("\n", "")
    val parsed = BronzeIngest.parse(Seq(bad).toDF("value"))
    val r = parsed.collect().head
    assert(r.getAs[java.sql.Date]("datetime") == null)
    val adapted = graft.ingest.ReferenceEvents.adapt(parsed).collect().head
    assert(adapted.isNullAt(adapted.fieldIndex("ts_us")))
  }
}
