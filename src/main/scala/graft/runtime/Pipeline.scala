package graft.runtime

import graft.gold._
import graft.ingest.Events
import graft.silver.{Dedup, MergeUpsert, Sessionize}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** C5: the deterministic job DAG (reference gold_daily_dag.py:146 runs the
  * five gold jobs strictly sequentially because webtoon reads the episode
  * Gold table). In our engine the chain is plain code: bronze-shaped events
  * → silver merge-upsert → gold tables in dependency order, with the C4
  * completeness gate between layers and a failure callback standing in for
  * the reference's alerting hook (C6).
  */
object Pipeline {

  case class Result(table: String, rows: Long)

  /** Runs the full chain for one source dir into `warehouseDir`.
    * Returns per-table row counts; calls `onFailure` and rethrows on the
    * first failing stage. */
  def runDaily(spark: SparkSession, sfDir: String, warehouseDir: String,
               minSilverFiles: Int = 1,
               onFailure: (String, Throwable) => Unit = (_, _) => ())
      : Seq[Result] = {
    def stage[T](name: String)(body: => T): T =
      try body
      catch { case e: Throwable => onFailure(name, e); throw e }

    val silverDir = s"$warehouseDir/silver_sessions"
    val silver = stage("silver") {
      val sessions =
        Sessionize.sessions(Dedup.keepLatest(Events.cleansed(spark, sfDir)))
      MergeUpsert.upsert(spark, silverDir, sessions, Sessionize.SessionKey)
      spark.read.parquet(silverDir)
    }

    // C4 gate: silver partitions must exist before gold runs.
    stage("gate") {
      require(Incremental.completenessGate(spark, silverDir, 0) &&
        silver.take(1).nonEmpty, s"completeness gate failed for $silverDir")
    }

    def writeGold(name: String, df: DataFrame): Result = stage(name) {
      val dir = s"$warehouseDir/$name"
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      df.write.partitionBy("datetime").mode("overwrite").parquet(dir)
      Result(name, spark.read.parquet(dir).count())
    }

    // Reference order (C5): user → episode → webtoon (reads episode gold)
    // → platform/device → country.
    val user = writeGold("gold_user_daily", UserDaily.build(silver))
    val episode = writeGold("gold_episode_daily", EpisodeDaily.build(silver))
    val episodeGold =
      spark.read.parquet(s"$warehouseDir/gold_episode_daily")
    val webtoon = writeGold("gold_webtoon_daily",
      WebtoonDaily.build(silver, episodeGold))
    val platform = writeGold("gold_platform_device_daily",
      PlatformDeviceDaily.build(silver))
    val country = writeGold("gold_country_daily", CountryDaily.build(silver))

    Seq(Result("silver_sessions", silver.count()), user, episode, webtoon,
      platform, country)
  }
}
