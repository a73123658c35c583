package graft

import graft.ops.Features
import org.apache.spark.sql.functions._

/** Point-in-time correctness: a label may only ever see snapshots of
  * STRICTLY EARLIER days — the leakage property that separates a feature
  * store from a plain join. */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("every attached snapshot is from a strictly earlier day") {
    val out = Features.userPitFeatures(spark, "/root/testdata/sf0.001")
      .withColumn("label_date", to_date(expr("timestamp_micros(ts_us)")))
    assert(out.count() > 0)
    val leaks = out.filter(col("feat_date").isNotNull &&
      col("feat_date") >= col("label_date"))
    assert(leaks.isEmpty, "label saw a same-day or future snapshot")
    // and matches exist at all (the join is not vacuously null)
    assert(out.filter(col("feat_date").isNotNull).count() > 0)
  }

  test("first-day purchases get null features; cumulative state is " +
      "consistent") {
    val events = Seq(
      // user 1: active day 1 (2 events, one 5.00 purchase), buys day 2
      (1L, 1L, usOf("2024-01-01 10:00:00"), "view", 0.0),
      (2L, 1L, usOf("2024-01-01 11:00:00"), "purchase", 5.0),
      (3L, 1L, usOf("2024-01-02 09:00:00"), "purchase", 7.0),
      // user 2: first-ever event is a purchase -> no servable snapshot
      (4L, 2L, usOf("2024-01-05 12:00:00"), "purchase", 3.0))
      .toDF("event_id", "user_id", "ts_us", "event_type", "value")
      .withColumn("value_cents",
        expr("cast(round(value * 100, 0) as bigint)"))
      .withColumn("event_date", to_date(expr("timestamp_micros(ts_us)")))
    val snaps = Features.dailySnapshots(
      events.select("user_id", "event_date", "event_type", "value_cents"))
    val labels = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event_id"),
        col("ts_us"), col("value_cents"))
    val out = graft.ops.AsOfJoin.asOf(labels, snaps, Seq("user_id"),
      "ts_us", "snap_ts_us")
      .collect().map(r => r.getAs[Long]("purchase_event_id") -> r).toMap
    // day-1 purchase: nothing servable yet
    assert(out(2L).isNullAt(out(2L).fieldIndex("feat_date")))
    // day-2 purchase: sees exactly day-1 state (2 events, 500 cents)
    val r3 = out(3L)
    assert(r3.getAs[java.sql.Date]("feat_date").toString == "2024-01-01")
    assert(r3.getAs[Long]("n_events_day") == 2L)
    assert(r3.getAs[Long]("spend_to_date_cents") == 500L)
    assert(r3.getAs[Int]("days_active_to_date") == 1)
    // user 2 first-ever purchase: null features
    assert(out(4L).isNullAt(out(4L).fieldIndex("feat_date")))
  }

  private def usOf(s: String): Long =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
}
