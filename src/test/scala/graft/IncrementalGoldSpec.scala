package graft

import graft.gold.{CountryDaily, EpisodeDaily, UserDaily, WebtoonDaily}
import graft.runtime.IncrementalGold
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental gold maintenance == full recompute, cell-for-cell, on
  * the real sf0.001 sessions: seed the gold from a date-truncated
  * silver, apply the remaining dates as the delta, and the table must
  * land exactly where a from-scratch build does — including the
  * cross-date retention rows at the seed/delta boundary, which is
  * precisely what a naive snapshot-date-scoped recompute gets wrong. */
class IncrementalGoldSpec extends SparkSpec {

  private lazy val sessions = graft.silver.Sessionize
    .sessions(graft.ingest.Events.cleansed(spark, "/root/testdata/sf0.001"))
    .persist()

  private lazy val dates = sessions.select(col("datetime")).distinct()
    .collect().map(_.getDate(0)).sortBy(_.getTime)

  private def cutAt(n: Int) = {
    val cut = dates(dates.length - n)
    (sessions.filter(col("datetime") < lit(cut)),
      sessions.filter(col("datetime") >= lit(cut)))
  }

  private def assertSame(dir: String, full: DataFrame): Unit = {
    val cols = full.columns.sorted.map(col).toSeq
    val got = spark.read.parquet(dir).select(cols: _*)
    val exp = full.select(cols: _*)
    assert(got.count() == exp.count(),
      s"row counts: got ${got.count()} expected ${exp.count()}")
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
      "incremental gold diverged from the full recompute")
  }

  test("user gold: user-scoped delta == full recompute") {
    assert(dates.length >= 4, s"need several dates, got ${dates.length}")
    val (seed, delta) = cutAt(2)
    val dir = tmpDir("ig-user")
    UserDaily.build(seed).write.partitionBy("datetime")
      .mode("overwrite").parquet(dir)
    IncrementalGold.userDailyDelta(spark, sessions, dir,
      delta.select(col("user_id")))
    assertSame(dir, UserDaily.build(sessions))
  }

  test("webtoon gold: date-scoped delta (yesterday-anchored rows) == " +
      "full recompute") {
    val (seed, delta) = cutAt(2)
    val dir = tmpDir("ig-webtoon")
    WebtoonDaily.build(seed, EpisodeDaily.build(seed))
      .write.partitionBy("datetime").mode("overwrite").parquet(dir)
    val deltaDates = delta.select(col("datetime")).distinct()
      .collect().map(_.getDate(0)).toSeq
    IncrementalGold.webtoonDailyDelta(spark, sessions, dir, deltaDates)
    assertSame(dir,
      WebtoonDaily.build(sessions, EpisodeDaily.build(sessions)))
  }

  test("country gold: date-scoped delta (back halo) == full recompute") {
    val (seed, delta) = cutAt(2)
    val dir = tmpDir("ig-country")
    CountryDaily.build(seed).write.partitionBy("datetime")
      .mode("overwrite").parquet(dir)
    val deltaDates = delta.select(col("datetime")).distinct()
      .collect().map(_.getDate(0)).toSeq
    IncrementalGold.countryDailyDelta(spark, sessions, dir, deltaDates)
    assertSame(dir, CountryDaily.build(sessions))
  }

  test("user gold: shrinking delta DELETES the (date, user) grains the " +
      "recompute no longer produces") {
    // A late-arriving event can move a user's silver rows off a date
    // (re-stamped redelivery, session re-derivation) — the recompute
    // then has no row for that (date, user), and a keyed upsert would
    // keep the stale gold row forever. Simulate the post-shrink silver
    // directly: seed the gold from the FULL silver, then drop one
    // user's rows on the last date and run the delta for that user.
    val dir = tmpDir("ig-user-shrink")
    UserDaily.build(sessions).write.partitionBy("datetime")
      .mode("overwrite").parquet(dir)
    val lastDate = dates.last
    val victim = sessions.filter(col("datetime") === lit(lastDate))
      .select(col("user_id")).limit(1).collect().head.get(0)
    val shrunk = sessions.filter(!(col("datetime") === lit(lastDate) &&
      col("user_id") === lit(victim)))
    import spark.implicits._
    IncrementalGold.userDailyDelta(spark, shrunk, dir,
      Seq(victim.toString).toDF("user_id")
        .select(col("user_id").cast(
          sessions.schema("user_id").dataType)))
    assertSame(dir, UserDaily.build(shrunk))
    assert(spark.read.parquet(dir)
      .filter(col("datetime") === lit(lastDate) &&
        col("user_id") === lit(victim)).count() == 0L,
      "vanished (date, user) grain must be deleted from the gold")
  }

  test("country gold: a date whose silver rows all vanished is deleted, " +
      "partition directory included") {
    val dir = tmpDir("ig-country-shrink")
    CountryDaily.build(sessions).write.partitionBy("datetime")
      .mode("overwrite").parquet(dir)
    val lastDate = dates.last
    val shrunk = sessions.filter(col("datetime") =!= lit(lastDate))
    IncrementalGold.countryDailyDelta(spark, shrunk, dir, Seq(lastDate))
    assertSame(dir, CountryDaily.build(shrunk))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir,
      s"datetime=$lastDate")),
      "all-grains-vanished date partition must be deleted")
  }

  test("delta replay is idempotent") {
    val (seed, delta) = cutAt(2)
    val dir = tmpDir("ig-idem")
    UserDaily.build(seed).write.partitionBy("datetime")
      .mode("overwrite").parquet(dir)
    IncrementalGold.userDailyDelta(spark, sessions, dir,
      delta.select(col("user_id")))
    IncrementalGold.userDailyDelta(spark, sessions, dir,
      delta.select(col("user_id")))
    assertSame(dir, UserDaily.build(sessions))
  }
}
