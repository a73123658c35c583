package graft

import graft.gold.{CountryDaily, EpisodeDaily, PlatformDeviceDaily,
  UserDaily, WebtoonDaily}
import graft.ingest.Events
import graft.silver.{Dedup, Sessionize}
import graft.sql.PipelineSql
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** SQL-surface parity: the sessionization silver and the user gold run
  * end-to-end as spark.sql DDL + INSERT/SELECT (graft.sql.PipelineSql)
  * must produce frames identical to the DataFrame path — the reference's
  * tables are a SQL surface, so graft's SQL text is pinned to the engine
  * semantics. */
class SqlParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def assertSameFrame(a: DataFrame, b: DataFrame,
                              what: String): Unit = {
    val bAligned = b.select(a.columns.map(col).toIndexedSeq: _*)
    // nullability-insensitive: a parquet round-trip relaxes non-null
    // derivations to nullable without changing a single value
    def shape(df: DataFrame) = df.schema.map(f => (f.name, f.dataType))
    assert(shape(a) == shape(bAligned),
      s"$what schema diverged:\n${a.schema}\nvs\n${bAligned.schema}")
    assert(a.exceptAll(bAligned).isEmpty && bAligned.exceptAll(a).isEmpty,
      s"$what rows diverged")
    assert(a.count() > 0, s"$what vacuous: zero rows")
  }

  test("silver sessionization: SQL INSERT/SELECT == DataFrame path") {
    val wh = tmpDir("sqlparity")
    Events.cleansed(spark, dir).createOrReplaceTempView("cleansed_events")
    val dfSilver =
      Sessionize.sessions(Dedup.keepLatest(Events.cleansed(spark, dir)))

    spark.sql("DROP TABLE IF EXISTS silver_sessions_sql")
    spark.sql(s"CREATE TABLE silver_sessions_sql (${dfSilver.schema.toDDL})" +
      s" USING parquet LOCATION '$wh/silver_sessions_sql'")
    spark.sql(PipelineSql.silverInsert("silver_sessions_sql",
      "cleansed_events"))

    assertSameFrame(dfSilver, spark.table("silver_sessions_sql"), "silver")
    spark.sql("DROP TABLE IF EXISTS silver_sessions_sql")
  }

  test("user gold: SQL SELECT over the silver table == DataFrame path") {
    val wh = tmpDir("sqlparity-gold")
    Events.cleansed(spark, dir).createOrReplaceTempView("cleansed_events")
    val dfSilver =
      Sessionize.sessions(Dedup.keepLatest(Events.cleansed(spark, dir)))
    spark.sql("DROP TABLE IF EXISTS silver_sessions_sql2")
    spark.sql(
      s"CREATE TABLE silver_sessions_sql2 (${dfSilver.schema.toDDL})" +
        s" USING parquet LOCATION '$wh/silver_sessions_sql2'")
    spark.sql(PipelineSql.silverInsert("silver_sessions_sql2",
      "cleansed_events"))

    val sqlGold = spark.sql(
      PipelineSql.goldUserDailySelect("silver_sessions_sql2"))
    // The DataFrame gold over the SAME materialized silver (both paths
    // must read identical input for a pure surface comparison).
    val dfGold = UserDaily.build(spark.table("silver_sessions_sql2"))
    assertSameFrame(dfGold, sqlGold, "gold_user_daily")

    // ... and the materialized-silver input itself equals the in-memory
    // frame (first test), so transitively SQL gold == the registered
    // DataFrame gold pipeline.
    spark.sql("DROP TABLE IF EXISTS silver_sessions_sql2")
  }

  test("episode/webtoon/country/platform golds: SQL SELECT == DataFrame") {
    // One materialized silver feeds all four remaining gold tables, so
    // the full 6-stage pipeline (silver + 5 golds) is now expressible by
    // a SQL-only consumer — the reference's tables are consumed through
    // SQL (Trino/Spark SQL over Iceberg).
    val wh = tmpDir("sqlparity-gold4")
    Events.cleansed(spark, dir).createOrReplaceTempView("cleansed_events")
    val dfSilver =
      Sessionize.sessions(Dedup.keepLatest(Events.cleansed(spark, dir)))
    spark.sql("DROP TABLE IF EXISTS silver_sessions_sql4")
    spark.sql(
      s"CREATE TABLE silver_sessions_sql4 (${dfSilver.schema.toDDL})" +
        s" USING parquet LOCATION '$wh/silver_sessions_sql4'")
    spark.sql(PipelineSql.silverInsert("silver_sessions_sql4",
      "cleansed_events"))
    val silver = spark.table("silver_sessions_sql4")

    assertSameFrame(EpisodeDaily.build(silver),
      spark.sql(PipelineSql.goldEpisodeDailySelect("silver_sessions_sql4")),
      "gold_episode_daily")
    assertSameFrame(
      WebtoonDaily.build(silver, EpisodeDaily.build(silver)),
      spark.sql(PipelineSql.goldWebtoonDailySelect("silver_sessions_sql4")),
      "gold_webtoon_daily")
    assertSameFrame(CountryDaily.build(silver),
      spark.sql(PipelineSql.goldCountryDailySelect("silver_sessions_sql4")),
      "gold_country_daily")
    assertSameFrame(PlatformDeviceDaily.build(silver),
      spark.sql(
        PipelineSql.goldPlatformDeviceDailySelect("silver_sessions_sql4")),
      "gold_platform_device_daily")

    spark.sql("DROP TABLE IF EXISTS silver_sessions_sql4")
  }
}
