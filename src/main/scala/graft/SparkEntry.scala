package graft

import graft.gold._
import graft.ingest.Events
import graft.oracle.Oracles
import graft.silver.{Dedup, Sessionize}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a 1:1 DuckDB oracle in `oracleSql`
  * (graft.oracle.Oracles) unless the operation is not SQL-expressible.
  */
object SparkEntry {

  /** Silver table: cleanse → dedup → sessionize (SURVEY.md §3.2). */
  private def silver(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(Dedup.keepLatest(Events.cleansed(s, dir)))

  /** Gold jobs read the (already deduped) silver sessions; recomputed here
    * per query because the harness has no shared materialization. The
    * silver-side dedup is exercised in `silver_sessions`. */
  private def sessions(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(Events.cleansed(s, dir))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    UserDaily.build(sessions(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "silver_sessions" -> ((s, dir) => silver(s, dir)),
    "gold_user_daily" -> ((s, dir) => UserDaily.build(sessions(s, dir))),
    "gold_episode_daily" -> ((s, dir) =>
      EpisodeDaily.build(sessions(s, dir))),
    "gold_webtoon_daily" -> ((s, dir) => {
      val sess = sessions(s, dir)
      WebtoonDaily.build(sess, EpisodeDaily.build(sess))
    }),
    "gold_country_daily" -> ((s, dir) => CountryDaily.build(sessions(s, dir))),
    "gold_platform_device_daily" -> ((s, dir) =>
      PlatformDeviceDaily.build(sessions(s, dir))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "silver_sessions" -> Oracles.silverSessions,
    "gold_user_daily" -> Oracles.goldUserDaily,
    "gold_episode_daily" -> Oracles.goldEpisodeDaily,
    "gold_webtoon_daily" -> Oracles.goldWebtoonDaily,
    "gold_country_daily" -> Oracles.goldCountryDaily,
    "gold_platform_device_daily" -> Oracles.goldPlatformDeviceDaily,
  )
}
