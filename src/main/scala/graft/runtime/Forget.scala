package graft.runtime

import graft.silver.MergeUpsert
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten over the incremental warehouse: remove every
  * trace of one user from bronze, silver, the golds, the quarantine
  * and the CDC change logs — the compliance operation a user-behavior
  * store (the reference's domain) owes by law, and a training-data
  * pipeline owes its opt-outs. Composed entirely from the existing
  * scoped machinery, so the bill is delta-scaled:
  *
  *  - BRONZE rewrites only the batch partitions that hold the user's
  *    events ([[MergeUpsert.replacePartitions]] — the affected-batch
  *    list is a metadata-scale collect);
  *  - SILVER and the user-keyed gold converge to "user absent" via
  *    [[MergeUpsert.upsertScoped]] with an EMPTY recompute of the user
  *    scope — exactly the deletion-propagation path the incremental
  *    chain already proves;
  *  - the AGGREGATE golds (episode/webtoon/platform/country/sketch)
  *    recompute their affected DATES from the purged silver through
  *    [[IncrementalGold]] — one user's removal changes those
  *    aggregates, and a recompute is the only honest way to un-count
  *    them (including the HLL sketch bytes, which embed the user's
  *    hash until rebuilt). When a table already publishes a change
  *    log, the recompute publishes its delta like any other batch —
  *    aggregates are not personal data, and downstream consumers need
  *    to learn the numbers moved;
  *  - the user-KEYED change logs (silver, user gold) are PURGED
  *    ([[ChangeLog.purge]]): their entries carry the user's row
  *    images, so tombstoning instead of erasing would defeat the
  *    point. This deliberately rewrites history — the post-forget
  *    contract is "a log in which the user never existed"; all other
  *    keys replay unchanged, and a consumer whose checkpointed state
  *    predates the forget must re-apply the purge themselves (the
  *    out-of-band compliance signal every CDC consumer contract
  *    carries);
  *  - the QUARANTINE drops the user's rejected rows from their source
  *    batch partitions.
  *
  * Crash safety / idempotency: every step derives its scope from its
  * OWN surface's current content (never from another step's
  * pre-state), so a retry after a crash purges exactly what remains
  * and converges; a second [[forgetUser]] of the same user is a no-op
  * receipt of zeros. The aggregate-gold recompute derives its date
  * set from silver AND the user gold BEFORE either is purged, so a
  * crash between the two still finds the dates on retry.
  *
  * Single-writer assumption, like every maintenance op here: the
  * published aggregate deltas take the next batch id after every
  * log's and bronze's high watermark — the caller resumes ingest at
  * ids past the returned receipt's `batchId`.
  *
  * Scope: the bronze-rooted incremental warehouse, where BRONZE is
  * the system of record. A warehouse whose tables re-derive from an
  * external immutable source (the full-recompute chain reading a
  * shared events file) cannot honor erasure here — the next recompute
  * would resurrect the user from that source; erasure must happen at
  * the source itself. Likewise out of scope by definition: backups
  * and downstream consumers' checkpointed state (the out-of-band
  * compliance signal). */
object Forget {

  /** One purged surface: table name → rows removed. */
  case class Receipt(batchId: Long, purged: Seq[(String, Long)]) {
    def total: Long = purged.map(_._2).sum
  }

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** A table that a delete-capable mode emptied down to its `_SUCCESS`
    * marker has no parquet footer to infer a schema from — for a purge
    * that state simply means "no trace left" (a retried forget must
    * not crash on the emptiness the first attempt produced). */
  private def readIfData(spark: SparkSession,
                         dir: String): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && MergeUpsert.sweepAndHasData(fs, p))
      Some(spark.read.parquet(dir))
    else None
  }

  def forgetUser(spark: SparkSession, bronzeDir: String,
                 warehouseDir: String, userId: Long): Receipt = {
    import spark.implicits._
    val keep: Column = !(col("user_id") <=> lit(userId))
    val silverDir = s"$warehouseDir/silver_sessions"
    val userGoldDir = s"$warehouseDir/gold_user_daily"
    val quarDir = s"$warehouseDir/quarantine_events"
    val receipts = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]

    // The aggregate-gold recompute scope, gathered BEFORE any purge:
    // every date the user contributed to, visible from silver or the
    // user gold (either survives a half-done prior attempt).
    val affectedDates: Seq[java.sql.Date] =
      Seq(silverDir, userGoldDir)
        .flatMap(readIfData(spark, _)).flatMap { t =>
          t.filter(!keep).select(col("datetime")).distinct()
            .collect().map(_.getDate(0))
        }.distinct

    // Aggregate deltas publish past every existing watermark.
    val logged = Pipeline.loggedTables.map(_._1)
    val batchId = 1L + (
      Incremental.highWatermark(spark, bronzeDir).getOrElse(0L) +:
        logged.map(t => Incremental.highWatermark(spark,
          ChangeLog.logDir(s"$warehouseDir/$t")).getOrElse(0L))).max

    // 1. Bronze: rewrite only the batch partitions holding the user.
    readIfData(spark, bronzeDir).foreach { bronze =>
      val hit = bronze.filter(!keep)
      val n = hit.count()
      receipts += ("bronze" -> n)
      if (n > 0) {
        val batches = hit.select(col("batch_id")).distinct()
          .collect().map(_.get(0)).toIndexedSeq
        MergeUpsert.replacePartitions(spark, bronzeDir,
          bronze.filter(col("batch_id").isin(batches: _*) && keep),
          batches, partitionCol = "batch_id")
      }
    }

    // 2. Silver / user gold: empty recompute of the user scope —
    // scope rows drop, emptied date partitions delete.
    def purgeScoped(dir: String, name: String): Unit =
      readIfData(spark, dir).foreach { t =>
        receipts += (name -> t.filter(!keep).count())
        MergeUpsert.upsertScoped(spark, dir, t.filter(lit(false)),
          Seq("user_id"), Seq(userId).toDF("user_id"))
      }
    purgeScoped(silverDir, "silver_sessions")

    // 3. Aggregate golds: recompute the affected dates from the purged
    // silver; tables that already publish CDC publish this delta too.
    if (affectedDates.nonEmpty)
      readIfData(spark, silverDir).foreach { silver =>
      def cdc(dir: String): Option[Long] =
        if (ChangeLog.readLog(spark, dir).isDefined) Some(batchId)
        else None
      Seq(
        ("gold_episode_daily",
          IncrementalGold.episodeDailyDelta(spark, silver, _: String,
            affectedDates, _: Option[Long])),
        ("gold_webtoon_daily",
          IncrementalGold.webtoonDailyDelta(spark, silver, _: String,
            affectedDates, _: Option[Long])),
        ("gold_platform_device_daily",
          IncrementalGold.platformDeviceDailyDelta(spark, silver,
            _: String, affectedDates, _: Option[Long])),
        ("gold_country_daily",
          IncrementalGold.countryDailyDelta(spark, silver, _: String,
            affectedDates, _: Option[Long])),
        ("gold_user_sketch",
          IncrementalGold.userSketchDelta(spark, silver, _: String,
            affectedDates, _: Option[Long]))
      ).foreach { case (t, run) =>
        val dir = s"$warehouseDir/$t"
        if (exists(spark, dir)) run(dir, cdc(dir))
      }
    }
    purgeScoped(userGoldDir, "gold_user_daily")

    // 4. User-keyed change logs: erase the user's images.
    receipts += ("silver_sessions_changelog" ->
      ChangeLog.purge(spark, silverDir, keep))
    receipts += ("gold_user_daily_changelog" ->
      ChangeLog.purge(spark, userGoldDir, keep))

    // 5. Quarantine: the user's rejected raw rows, per source batch.
    readIfData(spark, quarDir).foreach { q =>
      val hit = q.filter(!keep)
      val n = hit.count()
      receipts += ("quarantine_events" -> n)
      if (n > 0) {
        val batches = hit.select(col("batch_id")).distinct()
          .collect().map(_.get(0)).toIndexedSeq
        MergeUpsert.replacePartitions(spark, quarDir,
          q.filter(col("batch_id").isin(batches: _*) && keep),
          batches, partitionCol = "batch_id")
      }
    }
    Receipt(batchId, receipts.toSeq)
  }
}
