package graft

import graft.gold._
import graft.ingest.Events
import graft.runtime.{Incremental, Pipeline}
import graft.silver.{Dedup, Sessionize}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end incremental chain on real sf0.001 events: bronze batches
  * (including a redelivery) → user-scoped silver → delta-scoped golds;
  * after every run, silver AND all six gold tables (sketch included) must equal the
  * full from-scratch recompute. */
class IncrementalPipelineSpec extends SparkSpec {

  private def assertSame(got: DataFrame, exp: DataFrame,
                         what: String): Unit = {
    val cols = exp.columns.sorted.map(col).toSeq
    val g = got.select(cols: _*)
    val e = exp.select(cols: _*)
    assert(g.exceptAll(e).isEmpty && e.exceptAll(g).isEmpty,
      s"$what diverged from the full recompute")
  }

  test("incremental daily chain == full recompute for silver and " +
      "all six golds, including a redelivery batch") {
    val raw = Events.raw(spark, "/root/testdata/sf0.001").persist()
    val dts = raw.select(to_date(col("ts")).as("d")).distinct()
      .collect().map(_.getDate(0)).sortBy(_.getTime)
    assert(dts.length >= 4)
    val cut = dts(dts.length - 2)
    val bronze = tmpDir("ip-bronze")
    val wh = tmpDir("ip-wh")

    Incremental.appendBatch(spark, bronze,
      raw.filter(to_date(col("ts")) < lit(cut)), 1L)
    var wm = Pipeline.runDailyIncremental(spark, bronze, wh, None)
    assert(wm.contains(1L))

    Incremental.appendBatch(spark, bronze,
      raw.filter(to_date(col("ts")) >= lit(cut)), 2L)
    wm = Pipeline.runDailyIncremental(spark, bronze, wh, wm)
    assert(wm.contains(2L))

    // Redelivery: the first date's events arrive AGAIN (duplicate
    // event_ids) — the keep-latest dedup + user-scoped re-derivation
    // must leave every table exactly where it was.
    Incremental.appendBatch(spark, bronze,
      raw.filter(to_date(col("ts")) === lit(dts(0))), 3L)
    wm = Pipeline.runDailyIncremental(spark, bronze, wh, wm)
    assert(wm.contains(3L))

    val fullSilver = Sessionize.sessions(
      Dedup.keepLatest(Events.cleanse(Events.enrich(raw)))).persist()
    assertSame(spark.read.parquet(s"$wh/silver_sessions"), fullSilver,
      "silver")
    assertSame(spark.read.parquet(s"$wh/gold_user_daily"),
      UserDaily.build(fullSilver), "user gold")
    assertSame(spark.read.parquet(s"$wh/gold_episode_daily"),
      EpisodeDaily.build(fullSilver), "episode gold")
    assertSame(spark.read.parquet(s"$wh/gold_webtoon_daily"),
      WebtoonDaily.build(fullSilver, EpisodeDaily.build(fullSilver)),
      "webtoon gold")
    assertSame(spark.read.parquet(s"$wh/gold_platform_device_daily"),
      PlatformDeviceDaily.build(fullSilver), "platform gold")
    assertSame(spark.read.parquet(s"$wh/gold_country_daily"),
      CountryDaily.build(fullSilver), "country gold")
    // Sketch gold: compare (datetime, dau_est) — the estimate is the
    // contract (a pure function of the day's user set); the serialized
    // sketch bytes are an implementation detail of build order.
    assertSame(
      spark.read.parquet(s"$wh/gold_user_sketch")
        .select(col("datetime"), col("dau_est")),
      graft.runtime.SketchGold.silverDailySketch(fullSilver)
        .select(col("datetime"), col("dau_est")), "sketch gold")

    // No-change run: watermark sticks, nothing rewritten.
    val before = spark.read.parquet(s"$wh/gold_user_daily").count()
    assert(Pipeline.runDailyIncremental(spark, bronze, wh, wm) == wm)
    assert(spark.read.parquet(s"$wh/gold_user_daily").count() == before)
  }
}
