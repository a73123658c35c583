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
  *    hash until rebuilt). When the purge emptied silver ENTIRELY
  *    (single-user warehouse, or a retry after a prior crash), the
  *    recompute has no rows and no schema to run over — the affected
  *    date partitions then converge to ABSENCE directly
  *    ([[IncrementalGold.dateScopedPurge]]), which is the same result
  *    the empty recompute would stage. Either way, a table that
  *    publishes a change log publishes this delta like any other
  *    batch — aggregates are not personal data, and downstream
  *    consumers need to learn the numbers moved;
  *  - the user-KEYED change logs (silver, user gold) are PURGED
  *    ([[ChangeLog.purge]]): their entries carry the user's row
  *    images, so tombstoning instead of erasing would defeat the
  *    point. This deliberately rewrites history — the post-forget
  *    contract is "a log in which the user never existed"; all other
  *    keys replay unchanged. Every view REGISTERED on a purged log
  *    ([[Consumers]]) is INVALIDATED ([[MaterializedView.invalidate]]):
  *    its aggregates were computed from images that no longer exist,
  *    and its next refresh re-seeds from the purged base instead of
  *    serving stale personal-data-derived numbers — no out-of-band
  *    re-seed, ForgetSpec proves the post-purge refresh serves the
  *    purged-correct counts. An UNREGISTERED consumer (a checkpointed
  *    stream whose state predates the forget) must still re-apply the
  *    purge itself — the out-of-band compliance signal every CDC
  *    consumer contract carries;
  *  - the QUARANTINE drops the user's rejected rows from their source
  *    batch partitions.
  *
  * Crash safety / idempotency: every step derives its scope from its
  * OWN surface's current content (never from another step's
  * pre-state), so a retry after a crash purges exactly what remains
  * and converges; a second [[forgetUser]] of the same user is a no-op
  * receipt of zeros. The aggregate-gold recompute derives its date
  * set from silver AND the user gold BEFORE either is purged, and the
  * set is persisted DURABLY (a `forget_pending` sidecar, removed only
  * when the forget completes) — a crash after the purges erased the
  * only copies of those dates still converges on retry, because the
  * retry reads the sidecar instead of the purged surfaces.
  *
  * Publish-id discipline: the aggregate deltas take the next id past
  * every log's and the chain's high watermark, and the warehouse's
  * durable CDC id offset ([[Pipeline.cdcIdOffsetPath]]) is bumped past
  * it BEFORE publishing — the next chain update (whose id the
  * streaming engine's epoch counter fixes) lands strictly after this
  * op's entries instead of colliding with them, with
  * [[ChangeLog.recordBatch]]'s producer guard failing loud as the
  * backstop. The caller no longer owes any id coordination.
  *
  * Single-writer assumption, like every maintenance op here: the op
  * must not race the chain or a view refresh.
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

  /** Durable copy of the aggregate-gold recompute scope: the affected
    * dates are derived from the user's rows, which the purges then
    * ERASE — a crash between the two would leave a retry with no way
    * to find the dates (the user may never have reached the user
    * gold). The sidecar closes that window: written before the first
    * purge, read-and-merged by a retry, deleted only on completion. */
  private def pendingPath(warehouseDir: String, userId: Long) =
    s"$warehouseDir/forget_pending/user-$userId"

  private def savePendingDates(spark: SparkSession, warehouseDir: String,
                               userId: Long,
                               dates: Seq[java.sql.Date]): Unit = {
    val p = new Path(pendingPath(warehouseDir, userId))
    val tmp = new Path(p.toString + ".tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(dates.map(_.toString).sorted.mkString("\n")
      .getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  private def loadPendingDates(spark: SparkSession, warehouseDir: String,
                               userId: Long): Seq[java.sql.Date] = {
    val p = new Path(pendingPath(warehouseDir, userId))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val in = fs.open(p)
    val text =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var n = in.read(chunk)
        while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        new String(buf.toByteArray, "UTF-8")
      } finally in.close()
    text.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      .map(java.sql.Date.valueOf).toSeq
  }

  def forgetUser(spark: SparkSession, bronzeDir: String,
                 warehouseDir: String, userId: Long): Receipt =
    forgetImpl(spark, bronzeDir, warehouseDir, userId,
      bronzeBatches = None)

  /** [[forgetUser]] with the bronze scope answered by a
    * [[KeyIndex]] instead of a full bronze scan — the 100 TB form.
    * The un-indexed op's one data-proportional step is finding WHICH
    * batch partitions hold the user; here that comes from a
    * bucket-pruned index lookup (metadata-scale), and bronze is only
    * read inside the partitions that will be rewritten anyway. The
    * index must be CURRENT: a watermark behind bronze's high
    * watermark fails loud (a stale index would silently leave the
    * user's newest batches unpurged — the one failure a compliance op
    * can never have); run [[KeyIndex.ensure]] first, it is
    * delta-scoped and cheap. The user's own index entries are purged
    * last ([[KeyIndex.purgeKey]]) — an index that remembered who was
    * forgotten would defeat the erasure; ordering it after the data
    * purge keeps a crash retry able to re-derive the scope.
    *
    * The silver/gold steps are unchanged — their scoping scans are
    * over the already-reduced sessionized surfaces and the same index
    * scheme could cover them if silver outgrows that. */
  def forgetUserIndexed(spark: SparkSession, bronzeDir: String,
                        warehouseDir: String, userId: Long,
                        indexDir: String = null,
                        buckets: Int = KeyIndex.DefaultBuckets): Receipt = {
    val idx = Option(indexDir).getOrElse(KeyIndex.dirFor(bronzeDir))
    val bronzeHw = Incremental.highWatermark(spark, bronzeDir)
    val batches: Seq[Any] = bronzeHw match {
      case None => Seq.empty
      case Some(hw) =>
        val wm = KeyIndex.watermark(spark, idx)
        if (!wm.exists(_ >= hw))
          sys.error(s"key index at $idx is STALE (indexed watermark " +
            s"${wm.map(_.toString).getOrElse("none")}, bronze at $hw) " +
            "— run KeyIndex.ensure first: a stale index would leave " +
            "the user's newest batches unpurged")
        KeyIndex.lookup(spark, idx, userId, buckets)
          .select("batch_id").collect().map(_.get(0)).toIndexedSeq
    }
    val receipt = forgetImpl(spark, bronzeDir, warehouseDir, userId,
      bronzeBatches = Some(batches))
    KeyIndex.purgeKey(spark, idx, userId, buckets)
    receipt
  }

  private def forgetImpl(spark: SparkSession, bronzeDir: String,
                         warehouseDir: String, userId: Long,
                         bronzeBatches: Option[Seq[Any]]): Receipt = {
    import spark.implicits._
    val keep: Column = !(col("user_id") <=> lit(userId))
    val silverDir = s"$warehouseDir/silver_sessions"
    val userGoldDir = s"$warehouseDir/gold_user_daily"
    val quarDir = s"$warehouseDir/quarantine_events"
    val receipts = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]

    // The aggregate-gold recompute scope, gathered BEFORE any purge:
    // every date the user contributed to, visible from silver or the
    // user gold — merged with the durable sidecar of a crashed prior
    // attempt (whose purges may have erased the rows these dates came
    // from), then re-persisted before anything mutates.
    val affectedDates: Seq[java.sql.Date] =
      (Seq(silverDir, userGoldDir)
        .flatMap(readIfData(spark, _)).flatMap { t =>
          t.filter(!keep).select(col("datetime")).distinct()
            .collect().map(_.getDate(0))
        } ++ loadPendingDates(spark, warehouseDir, userId)).distinct
    if (affectedDates.nonEmpty)
      savePendingDates(spark, warehouseDir, userId, affectedDates)

    // Aggregate deltas publish past every existing watermark — and the
    // durable CDC id offset is bumped past THEM before publishing, so
    // the next chain update (engine-epoch-keyed) cannot collide.
    val logged = Pipeline.loggedTables.map(_._1)
    val idOffset = Pipeline.cdcIdOffset(spark, warehouseDir)
    val bronzeHw = Incremental.highWatermark(spark, bronzeDir)
    val batchId = 1L + (
      (bronzeHw.getOrElse(0L) + idOffset) +:
        logged.map(t => Incremental.highWatermark(spark,
          ChangeLog.logDir(s"$warehouseDir/$t")).getOrElse(0L))).max
    val nextEndpointMin = bronzeHw.map(_ + 1L).getOrElse(0L)
    val bumped = math.max(idOffset, batchId + 1L - nextEndpointMin)
    // Only an op that will PUBLISH owns an id worth reserving — a
    // no-op forget (unknown user) must not widen the id space.
    if (bumped != idOffset && affectedDates.nonEmpty)
      Incremental.saveWatermark(spark,
        Pipeline.cdcIdOffsetPath(warehouseDir), bumped)

    // 1. Bronze: rewrite only the batch partitions holding the user.
    // The scope comes either from a full scan (the default path) or
    // from the caller's KeyIndex lookup — in which case bronze is only
    // ever READ partition-pruned to the batches being rewritten.
    readIfData(spark, bronzeDir).foreach { bronze =>
      bronzeBatches match {
        case Some(batches) =>
          if (batches.isEmpty) receipts += ("bronze" -> 0L)
          else {
            val scoped = bronze.filter(col("batch_id").isin(batches: _*))
            val n = scoped.filter(!keep).count()
            receipts += ("bronze" -> n)
            if (n > 0)
              MergeUpsert.replacePartitions(spark, bronzeDir,
                scoped.filter(keep), batches, partitionCol = "batch_id")
          }
        case None =>
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
    }

    // 2. Silver / user gold: empty recompute of the user scope —
    // scope rows drop, emptied date partitions delete.
    def purgeScoped(dir: String, name: String): Long =
      readIfData(spark, dir).map { t =>
        val n = t.filter(!keep).count()
        receipts += (name -> n)
        MergeUpsert.upsertScoped(spark, dir, t.filter(lit(false)),
          Seq("user_id"), Seq(userId).toDF("user_id"))
        n
      }.getOrElse(0L)
    val silverPurged = purgeScoped(silverDir, "silver_sessions")

    // 3. Aggregate golds: recompute the affected dates from the purged
    // silver; tables that already publish CDC publish this delta too.
    // A silver the purge EMPTIED has no rows and no schema to
    // recompute from — the affected dates then converge to absence
    // directly (dateScopedPurge), which is what the empty recompute
    // would stage, with the deletion delta published all the same.
    if (affectedDates.nonEmpty) {
      def cdc(dir: String): Option[Long] =
        if (ChangeLog.readLog(spark, dir).isDefined) Some(batchId)
        else None
      readIfData(spark, silverDir) match {
        case Some(silver) =>
          Seq(
            ("gold_episode_daily",
              IncrementalGold.episodeDailyDelta(spark, silver, _: String,
                affectedDates, _: Option[Long], producer = "forget")),
            ("gold_webtoon_daily",
              IncrementalGold.webtoonDailyDelta(spark, silver, _: String,
                affectedDates, _: Option[Long], producer = "forget")),
            ("gold_platform_device_daily",
              IncrementalGold.platformDeviceDailyDelta(spark, silver,
                _: String, affectedDates, _: Option[Long],
                producer = "forget")),
            ("gold_country_daily",
              IncrementalGold.countryDailyDelta(spark, silver, _: String,
                affectedDates, _: Option[Long], producer = "forget")),
            ("gold_user_sketch",
              IncrementalGold.userSketchDelta(spark, silver, _: String,
                affectedDates, _: Option[Long], producer = "forget"))
          ).foreach { case (t, run) =>
            val dir = s"$warehouseDir/$t"
            if (exists(spark, dir)) run(dir, cdc(dir))
          }
        case None =>
          Seq(
            ("gold_episode_daily",
              Seq("webtoon_id", "episode_id"), 0, identity[DataFrame] _),
            ("gold_webtoon_daily", Seq("webtoon_id"), 1,
              identity[DataFrame] _),
            ("gold_platform_device_daily",
              Seq("platform", "device", "browser"), 0,
              identity[DataFrame] _),
            ("gold_country_daily", Seq("country"), 1,
              identity[DataFrame] _),
            ("gold_user_sketch", Seq.empty[String], 0,
              (df: DataFrame) =>
                df.select(col("datetime"), col("dau_est")))
          ).foreach { case (t, grain, back, view) =>
            val dir = s"$warehouseDir/$t"
            if (exists(spark, dir)) {
              val dropped = readIfData(spark, dir).map(
                _.filter(col("datetime").isin(affectedDates: _*)).count())
                .getOrElse(0L)
              receipts += (s"$t (empty-silver date purge)" -> dropped)
              IncrementalGold.dateScopedPurge(spark, dir, affectedDates,
                grain, backDays = back, fwdDays = 0,
                changeLogBatch = cdc(dir), changeLogView = view,
                producer = "forget")
            }
          }
      }
    }
    val userGoldPurged = purgeScoped(userGoldDir, "gold_user_daily")

    // 4. User-keyed change logs: erase the user's images, then
    // invalidate every view registered on a log whose inputs this op
    // rewrote — whether through the log purge or through step 2's
    // (deliberately unlogged) table purge, the view's state no longer
    // equals seed + applied spans, and its next refresh must re-seed.
    def purgeLog(dir: String, name: String, tablePurged: Long): Unit = {
      val n = ChangeLog.purge(spark, dir, keep)
      receipts += (s"${name}_changelog" -> n)
      if (n > 0 || tablePurged > 0)
        Consumers.invalidateAll(spark, dir)
    }
    purgeLog(silverDir, "silver_sessions", silverPurged)
    purgeLog(userGoldDir, "gold_user_daily", userGoldPurged)

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
    // Complete: the durable date sidecar may retire.
    val pp = new Path(pendingPath(warehouseDir, userId))
    val pfs = pp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (pfs.exists(pp)) pfs.delete(pp, false)
    Receipt(batchId, receipts.toSeq)
  }
}
