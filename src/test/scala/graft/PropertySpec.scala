package graft

import graft.silver.{Dedup, Sessionize}
import graft.util.Skew
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized invariants (seeded, 20 trials each) over the core operators —
  * the property-based layer from SURVEY.md §5. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomEvents(seed: Long, n: Int) = {
    val rnd = new Random(seed)
    val t0 = 1700000000L * 1000000L
    val rows = (0 until n).map { i =>
      (i.toLong, rnd.nextInt(5).toLong,
        t0 + rnd.nextInt(7 * 24 * 3600).toLong * 1000000L,
        Seq("view", "click", "purchase", "error")(rnd.nextInt(4)),
        math.round(rnd.nextDouble() * 10000) / 100.0)
    }
    rows.toDF("event_id", "user_id", "ts_us", "event_type", "value")
      .withColumn("datetime", to_date(timestamp_micros(col("ts_us"))))
      .withColumn("value_cents",
        expr("cast(round(value * 100, 0) as bigint)"))
      .withColumn("webtoon_id",
        concat(lit("w"), (col("event_id") % 3).cast("string")))
      .withColumn("episode_id",
        concat(lit("e"), (col("event_id") % 7).cast("string")))
      .withColumn("country", lit("KR"))
      .withColumn("platform", lit("ios"))
      .withColumn("device", lit("phone"))
      .withColumn("browser", lit("chrome"))
  }

  test("property: dedup is idempotent and a no-op on unique keys") {
    for (seed <- 1 to 10) {
      val ev = randomEvents(seed, 200)
      val once = Dedup.keepLatest(ev)
      assert(once.count() == ev.count()) // unique event_ids
      val withDups = ev.unionByName(
        ev.limit(50).withColumn("ts_us", col("ts_us") + 1))
      val d1 = Dedup.keepLatest(withDups)
      val d2 = Dedup.keepLatest(d1)
      assert(d1.count() == ev.count())
      assert(d2.exceptAll(d1).isEmpty && d1.exceptAll(d2).isEmpty)
    }
  }

  test("property: sessionization invariants hold on random streams") {
    for (seed <- 11 to 20) {
      val ev = randomEvents(seed, 300)
      val sess = Sessionize.sessions(ev)
      // event conservation: session rows partition the input
      assert(sess.agg(sum(col("n_events"))).head.getLong(0) == 300L)
      // session key is unique
      assert(sess.count() ==
        sess.select(Sessionize.SessionKey.map(col): _*).distinct().count())
      // measures well-formed
      val bad = sess.filter(col("duration_ms") < 0 ||
        col("end_us") < col("start_us") ||
        (col("is_complete") === 1 && col("is_exit") === 1) ||
        col("max_value_cents") > col("sum_value_cents")).count()
      assert(bad == 0)
      // every event ts within its session bounds is implied by min/max agg;
      // check session_id groups respect the gap on a sample user
      val gaps = Sessionize.assignSessions(ev)
        .withColumn("prev", lag(col("ts_us"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("session_id"))
            .orderBy(col("ts_us"), col("event_id"))))
        .filter(col("prev").isNotNull &&
          col("ts_us") - col("prev") > graft.ingest.Events.SessionGapUs)
      assert(gaps.count() == 0)
    }
  }

  test("property: salted aggregation equals plain aggregation") {
    for (seed <- 21 to 25) {
      val rnd = new Random(seed)
      // skewed: 80% of rows on one key
      val rows = (0 until 500).map { i =>
        val k = if (rnd.nextDouble() < 0.8) "hot" else s"k${rnd.nextInt(10)}"
        (k, rnd.nextInt(1000).toLong)
      }
      val df = rows.toDF("k", "v")
      val salted = Skew.saltedSumCount(df, Seq("k"), "v", salts = 8)
        .select("k", "sum_v", "cnt").as[(String, Long, Long)]
        .collect().map { case (k, s, c) => k -> ((s, c)) }.toMap
      val plain = df.groupBy("k")
        .agg(sum("v").as("s"), count(lit(1)).as("c"))
        .as[(String, Long, Long)].collect()
        .map { case (k, s, c) => k -> ((s, c)) }.toMap
      assert(salted == plain)
    }
  }
}
