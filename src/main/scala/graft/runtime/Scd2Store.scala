package graft.runtime

import graft.ops.Scd2
import graft.silver.MergeUpsert
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED, INCREMENTALLY-MAINTAINED SCD2 dimension — the serving
  * form of [[graft.ops.Scd2]]. `fromLog` rebuilds the whole history
  * on every call: O(base + log), the honest bill ONCE, and the wrong
  * bill per refresh at 100 TB. This store pays that bill at seed time
  * and then keeps the dimension current from the log alone: each
  * [[refresh]] reads only the entries past its durable position and
  * rewrites only the key-hash BUCKETS those entries touch —
  * O(new entries + touched buckets), never O(history).
  *
  * What the store persists is the EVENT SET, finalized: version rows
  * (`is_open = true`, with `valid_to`/`is_current` computed) AND
  * tombstone rows (`is_open = false`). Tombstones must be stored —
  * they are the only record that a key's last version was CLOSED by a
  * removal rather than still current; a store of bare versions would
  * resurrect every removed key's final image as "current" on the next
  * per-bucket recompute. [[read]] filters them out of the serving
  * shape.
  *
  * Why the refresh converges (the crash story): events are FACTS —
  * unique per (keys, valid_from, is_open), append-only, and a key's
  * interval chain is a pure function of ITS OWN event set (keys are
  * independent; bucketing by key hash keeps every chain inside one
  * partition). A refresh therefore recomputes each touched bucket
  * from (its stored events) ∪ (the span's events), deduplicated —
  * re-running any prefix or the whole span re-derives the SAME
  * events, dedups to the same set, and rewrites the bucket to the
  * same rows. Idempotent like [[MaterializedView.refreshByRecompute]]
  * (and unlike the signed-fold views, which is why THEY need the
  * atomic position commit and this store only needs the position
  * file for work-skipping): the position file is written LAST, and
  * every crash window retries to the identical state.
  *
  * The store registers as a log consumer ([[Consumers]]) at each
  * committed position, so [[ChangeLog.checkpoint]] can never fold
  * entries it still owes a read — and a fold WITHIN an already-read
  * prefix is also safe for the events already stored (they are
  * facts; collapsing the log does not change what happened).
  *
  * Layout: parquet partitioned by `bucket = pmod(xxhash64(keys),
  * buckets)` — every key's whole chain in exactly one partition, so
  * a touched-bucket rewrite is complete by construction and a
  * point-key history lookup prunes to one partition. Buckets default
  * small (32); at 100 TB size them so a bucket fits an executor's
  * shuffle partition comfortably — the per-refresh rewrite cost is
  * (touched buckets / buckets) × |dimension|, the standard
  * granularity dial. */
object Scd2Store {

  val DefaultBuckets = 32
  private val BucketCol = "bucket"

  private def posPath(storeDir: String): String =
    storeDir.stripSuffix("/") + "_pos"

  /** The bucket count is LAYOUT, not a per-call knob: a refresh
    * hashing with a different count than the seed would route a key's
    * new events to a different partition than its stored chain — two
    * half-chains that never meet in one bucket recompute, silently
    * wrong intervals. Pinned durably at seed; later calls use the
    * pinned value and fail loud on an explicit mismatch. */
  private def bucketsPath(storeDir: String): String =
    storeDir.stripSuffix("/") + "_buckets"

  private def consumerName(storeDir: String): String =
    "scd2-" + MaterializedView.consumerName(storeDir).stripPrefix("mview-")

  /** Closed-version archive sibling (see [[archive]]) — same bucket
    * layout as the live store, read only by [[readHistory]]. */
  private def archivePath(storeDir: String): String =
    storeDir.stripSuffix("/") + "_archive"

  /** Highest cutoff [[archive]] has fully processed — the no-op
    * short-circuit. Without it every archive call pays a full live
    * scan to discover there is nothing below the cutoff, which at
    * 100 TB turns the steady-state "nothing to do" into the most
    * expensive answer. Sound to record even when nothing moved:
    * every future event carries `valid_from` past the committed
    * position ≥ the cutoff, so nothing below the cutoff can ever
    * become archivable. Written LAST (a crash retries the scan and
    * converges); deleted with the store on compliance invalidation
    * (a re-seeded, truncated history must not inherit the old
    * watermark). */
  private def archivedThroughPath(storeDir: String): String =
    storeDir.stripSuffix("/") + "_archived_through"

  private def withBucket(df: DataFrame, keys: Seq[String],
                         buckets: Int): DataFrame =
    df.withColumn(BucketCol,
      pmod(xxhash64(keys.map(col): _*), lit(buckets.toLong)).cast("int"))

  /** The serving shape: finalized version rows (tombstones and the
    * layout column stripped) — keys, value columns, `valid_from`,
    * `valid_to`, `is_current`. Same columns as
    * [[graft.ops.Scd2.fromLog]], so [[graft.ops.Scd2.joinAsOf]]
    * consumes it directly. */
  def read(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(storeDir)
      .filter(col(Scd2.OpenCol)).drop(Scd2.OpenCol).drop(BucketCol)

  /** Seed (first call) or incrementally extend the store from the
    * change log of the table at `tableDir`. Returns the log position
    * the store is now current as of. `basePosition` stamps the
    * pre-log baseline (seed only; it must precede every live entry
    * id — the [[ChangeLog.scd2]] guard, enforced here the same way). */
  def refresh(spark: SparkSession, tableDir: String, storeDir: String,
              keys: Seq[String], basePosition: Long = -1L,
              buckets: Int = DefaultBuckets): Long = {
    val ld = ChangeLog.logDir(tableDir)
    val logHw = Incremental.highWatermark(spark, ld).getOrElse(-1L)
    def registered(pos: Long): Long = {
      Consumers.register(spark, tableDir, consumerName(storeDir), pos,
        viewDir = Some(storeDir))
      pos
    }
    val root = new Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Compliance invalidation: [[Forget.forgetUser]] and
    // [[Retention.expireBefore]] PURGE the logs this store derives
    // from and mark every registered consumer invalid — and an SCD2
    // store is the worst possible place to miss that signal: it
    // persists HISTORICAL row images, so a purged user's versions
    // would keep serving from here forever. Honor the marker by
    // discarding the state and re-seeding from the (already purged)
    // base + log.
    if (MaterializedView.isInvalid(spark, storeDir)) {
      fs.delete(root, true)
      fs.delete(new Path(posPath(storeDir)), false)
      fs.delete(new Path(bucketsPath(storeDir)), false)
      // The archive holds the OLDEST historical images — the rows a
      // purge most wants gone. It re-seeds with the store.
      fs.delete(new Path(archivePath(storeDir)), true)
      fs.delete(new Path(archivedThroughPath(storeDir)), false)
    }
    val hasState = fs.exists(root) && MergeUpsert.sweepAndHasData(fs, root)
    // Layout pin (see [[bucketsPath]]): the seed records its bucket
    // count; every later refresh hashes with the PINNED count and
    // refuses an explicitly different ask.
    val pinned = Incremental.loadWatermark(spark, bucketsPath(storeDir))
      .map(_.toInt)
    val b = if (!hasState) buckets else pinned.getOrElse(buckets)
    if (hasState)
      pinned.filter(_ != buckets)
        .filter(_ => buckets != DefaultBuckets).foreach { p =>
          sys.error(s"store at $storeDir was seeded with $p buckets; " +
            s"refreshing with $buckets would split key chains across " +
            "partitions — re-seed into a fresh directory to change " +
            "the layout")
        }
    if (!hasState) {
      // Seed: the full fromLog event set — the one O(base + log) pass.
      Incremental.batches(spark, ld).minOption
        .filter(_ <= basePosition).foreach { lo =>
          sys.error(s"basePosition $basePosition is not below the " +
            s"lowest live log entry ($lo) — the ChangeLog.scd2 " +
            "contract; pass the position the baseline snapshot is " +
            "AS OF")
        }
      val current = spark.read.option("mergeSchema", "true")
        .parquet(tableDir)
      val events = ChangeLog.readLog(spark, tableDir) match {
        case Some(log) =>
          Scd2.baselineEvents(log, current, keys, basePosition)
            .unionByName(Scd2.logEvents(log, keys))
        case None =>
          // Nothing logged yet: every current row is a baseline open.
          current.withColumn("valid_from", lit(basePosition))
            .withColumn(Scd2.OpenCol, lit(true))
      }
      MergeUpsert.replaceAll(spark, storeDir,
        withBucket(Scd2.intervalize(events, keys), keys, b),
        partitionCol = BucketCol)
      Incremental.saveWatermark(spark, bucketsPath(storeDir), b.toLong)
      Incremental.saveWatermark(spark, posPath(storeDir), logHw)
      return registered(logHw)
    }
    val pos = Incremental.loadWatermark(spark, posPath(storeDir))
      .getOrElse(sys.error(s"store at $storeDir has data but no " +
        s"position file (${posPath(storeDir)}): the file is written " +
        "with the seed and only ever advances — restore it or " +
        "re-seed into a fresh directory"))
    if (pos >= logHw) return registered(pos)
    val span = ChangeLog.readSince(spark, tableDir, Some(pos))
      .getOrElse(return registered(pos))
    val spanEvents = withBucket(Scd2.logEvents(span, keys), keys, b)
      .localCheckpoint() // log-scale; reused for buckets + recompute
    val touched = spanEvents.select(col(BucketCol)).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    if (touched.isEmpty) {
      Incremental.saveWatermark(spark, posPath(storeDir), logHw)
      return registered(logHw)
    }
    // Recompute ONLY the touched buckets from their stored events ∪
    // the span's events. The dedup makes a replayed span a no-op:
    // the same entry re-derives the same (keys, valid_from, is_open)
    // event. Partition pruning keeps the read to the touched buckets.
    val stored = spark.read.option("mergeSchema", "true")
      .parquet(storeDir)
      .filter(col(BucketCol).isin(touched: _*))
      .drop("valid_to", "is_current")
    val events = stored
      .unionByName(spanEvents.filter(col(BucketCol).isin(touched: _*)),
        allowMissingColumns = true)
      .dropDuplicates(keys :+ "valid_from" :+ Scd2.OpenCol)
    MergeUpsert.replacePartitions(spark, storeDir,
      Scd2.intervalize(events, keys), touched, partitionCol = BucketCol)
    Incremental.saveWatermark(spark, posPath(storeDir), logHw)
    registered(logHw)
  }

  /** Age-bounded HISTORY COMPACTION: move every version that closed
    * strictly before `closedBefore` (and every tombstone that fired
    * strictly before it) out of the live buckets into the `_archive`
    * sibling, read only by [[readHistory]]. Events are append-forever
    * facts, so at high churn a key's closed versions pile up in its
    * bucket and every `is_current` serving read — and every touched-
    * bucket refresh rewrite — pays O(full history) instead of
    * O(live set). The split keeps the live store at live-set size
    * without giving up one row of history.
    *
    * Why the split is SAFE against the refresh recompute (which
    * re-intervalizes a touched bucket from its remaining stored
    * events): [[Scd2.intervalize]] links each version to the NEXT
    * event's `valid_from`, so removing a closed PREFIX of a key's
    * chain never changes a surviving row's interval; and the
    * tombstone predicate (`valid_from < closedBefore`) archives a
    * tombstone only together with the version it closed
    * (`valid_to = tombstone.valid_from < closedBefore`), so no bare
    * version is ever left to resurrect as "current", and no bare
    * tombstone to re-close a surviving open.
    *
    * Why it is SAFE against a crashed refresh's replay: `closedBefore`
    * must sit at or below the store's committed position (enforced
    * loud), every archived event has `valid_from < closedBefore ≤
    * pos`, and a retry span only re-derives events with
    * `valid_from > pos` — an archived event can never be re-derived
    * into the live set. Crash between the two writes here leaves an
    * event in BOTH archive and live: re-running [[archive]] converges
    * (the archive write dedups full rows; the live rewrite drops
    * them), and [[readHistory]] dedups regardless — duplicated-never-
    * lost, the same direction every crash window in this runtime
    * chooses. Closed rows are immutable (a version's `valid_to` is
    * its successor's `valid_from`, fixed once the successor exists;
    * `is_current` false forever), so full-row dedup is exact.
    *
    * Returns the number of events moved. */
  def archive(spark: SparkSession, storeDir: String,
              closedBefore: Long): Long = {
    val pos = Incremental.loadWatermark(spark, posPath(storeDir))
      .getOrElse(sys.error(s"no store at $storeDir (missing position " +
        "file) — seed with refresh before archiving"))
    if (closedBefore > pos)
      sys.error(s"closedBefore $closedBefore is past the store's " +
        s"committed position $pos — a crashed refresh's replay could " +
        "re-derive archived events into the live set; archive only " +
        "up to the committed position")
    // No-op short-circuit: a cutoff at or below the archived-through
    // watermark has nothing left to move — skip the live scan.
    if (Incremental.loadWatermark(spark, archivedThroughPath(storeDir))
        .exists(closedBefore <= _)) return 0L
    val live = spark.read.option("mergeSchema", "true").parquet(storeDir)
    val archivable = (col(Scd2.OpenCol) && col("valid_to").isNotNull &&
      col("valid_to") < lit(closedBefore)) ||
      (!col(Scd2.OpenCol) && col("valid_from") < lit(closedBefore))
    val moving = live.filter(archivable).localCheckpoint()
    val moved = moving.count()
    if (moved == 0L) {
      Incremental.saveWatermark(spark, archivedThroughPath(storeDir),
        closedBefore)
      return 0L
    }
    // ≤ bucket-count ints — metadata-scale collect by construction.
    val touched = moving.select(col(BucketCol)).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    val aDir = archivePath(storeDir)
    val aPath = new Path(aDir)
    val fs = aPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val archived =
      if (fs.exists(aPath) && MergeUpsert.sweepAndHasData(fs, aPath))
        spark.read.option("mergeSchema", "true").parquet(aDir)
          .filter(col(BucketCol).isin(touched: _*))
          .unionByName(moving, allowMissingColumns = true)
          .dropDuplicates()
      else moving
    // Archive FIRST, then drop from live: every crash window holds
    // the full history across the pair (duplicated, never lost).
    MergeUpsert.replacePartitions(spark, aDir, archived, touched,
      partitionCol = BucketCol)
    MergeUpsert.replacePartitions(spark, storeDir,
      live.filter(!archivable).filter(col(BucketCol).isin(touched: _*)),
      touched, partitionCol = BucketCol)
    Incremental.saveWatermark(spark, archivedThroughPath(storeDir),
      closedBefore)
    moved
  }

  /** The FULL history — live ∪ archive, in [[read]]'s serving shape
    * (finalized version rows; tombstones filtered). Full-row dedup
    * heals a between-writes [[archive]] crash (see there). Point-key
    * lookups still prune to one bucket per side. */
  def readHistory(spark: SparkSession, storeDir: String): DataFrame = {
    val aDir = archivePath(storeDir)
    val aPath = new Path(aDir)
    val fs = aPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = spark.read.option("mergeSchema", "true").parquet(storeDir)
    val all =
      if (fs.exists(aPath) && MergeUpsert.sweepAndHasData(fs, aPath))
        live.unionByName(
          spark.read.option("mergeSchema", "true").parquet(aDir),
          allowMissingColumns = true).dropDuplicates()
      else live
    all.filter(col(Scd2.OpenCol)).drop(Scd2.OpenCol).drop(BucketCol)
  }
}
