package graft

import graft.gold.{EpisodeDaily, UserDaily, WebtoonDaily}
import graft.ingest.ReferenceEvents
import graft.silver.{Dedup, Sessionize}
import graft.streaming.BronzeIngest
import org.apache.spark.sql.functions._

/** The "switch path": reference-shaped JSON wire events (producer session
  * ids, ISO timestamps, scroll measures, the enter→scroll→complete/exit
  * lifecycle) stream through BronzeIngest, adapt, and run the SAME
  * silver/gold pipeline — end to end. */
class ReferencePathSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: String, user: Int, session: String, webtoon: String,
                 episode: String, ts: String, etype: String,
                 ratio: Double, scrolls: Int, dwell: Long): String =
    s"""{"event_id":"$id","user_id":$user,"webtoon_id":"$webtoon",
       |"episode_id":"$episode","session_id":"$session",
       |"utimestamptz":"$ts","local_timestamptz":"$ts",
       |"event_type":"$etype","country":"KR","platform":"ios",
       |"device":"phone","browser":"chrome","scroll_ratio":$ratio,
       |"scroll_event_count":$scrolls,"dwell_time_ms":$dwell}"""
      .stripMargin.replace("\n", "")

  // Two sessions for user 1 (one completed, one abandoned), one for user 2
  // reading the next episode; duplicate redelivery of e2.
  private val wire = Seq(
    ev("e1", 1, "s1", "webtoon_1", "ep_1", "2024-01-01T10:00:00+00:00",
      "enter", 0.0, 0, 0),
    ev("e2", 1, "s1", "webtoon_1", "ep_1", "2024-01-01T10:00:30+00:00",
      "scroll", 0.4, 1, 30000),
    ev("e2", 1, "s1", "webtoon_1", "ep_1", "2024-01-01T10:00:30+00:00",
      "scroll", 0.4, 1, 30000), // Kafka redelivery
    ev("e3", 1, "s1", "webtoon_1", "ep_1", "2024-01-01T10:01:10+00:00",
      "complete", 1.0, 2, 70000),
    ev("e4", 1, "s2", "webtoon_1", "ep_2", "2024-01-01T11:00:00+00:00",
      "enter", 0.0, 0, 0),
    ev("e5", 1, "s2", "webtoon_1", "ep_2", "2024-01-01T11:00:40+00:00",
      "exit", 0.7, 1, 40000),
    ev("e6", 2, "s3", "webtoon_1", "ep_2", "2024-01-01T12:00:00+00:00",
      "enter", 0.0, 0, 0))

  test("reference wire format streams through to silver and gold") {
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    stream.addData(wire)
    val out = tmpDir("ref-bronze")
    BronzeIngest.start(BronzeIngest.parse(stream.toDF()), out,
      tmpDir("ref-ckpt"), availableNow = true).awaitTermination()

    val silver = Sessionize.sessionsFromProvided(
      Dedup.keepLatest(ReferenceEvents.adapt(spark.read.parquet(out)),
        key = "event_id"))
    val rows = silver.collect().map(r =>
      r.getAs[String]("session_id") -> r).toMap
    assert(rows.size == 3)
    // s1: completed, dedup removed the redelivery, max ratio = 1.0
    assert(rows("s1").getAs[String]("session_state") == "COMPLETE")
    assert(rows("s1").getAs[Long]("n_events") == 3)
    assert(rows("s1").getAs[Double]("max_value") == 1.0)
    assert(rows("s1").getAs[Long]("duration_ms") == 70000)
    // s2: explicit exit, dropoff ratio 0.7
    assert(rows("s2").getAs[String]("session_state") == "EXIT")
    assert(rows("s2").getAs[Int]("is_exit") == 1)
    // s3: no terminal event, old data ⇒ TIMEOUT_EXIT
    assert(rows("s3").getAs[String]("session_state") == "TIMEOUT_EXIT")

    // gold runs unchanged on the adapted silver
    val user = UserDaily.build(silver).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(user(1L).getAs[Long]("total_sessions") == 2)
    assert(user(1L).getAs[Long]("completed_sessions") == 1)
    val episode = EpisodeDaily.build(silver)
    val webtoon = WebtoonDaily.build(silver, episode).collect().head
    assert(webtoon.getAs[Long]("total_users") == 2)
    // deepest episode = argmax avg max ratio → ep_1 (1.0 vs 0.7/0.0)
    assert(webtoon.getAs[String]("deepest_episode_id") == "ep_1")
  }
}
