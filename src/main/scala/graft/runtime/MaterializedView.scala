package graft.runtime

import graft.ops.CdcView
import graft.silver.MergeUpsert
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED distributive group-by view over a change-logged table,
  * refreshed from the log ([[graft.ops.CdcView]]) — the operational
  * form of log-driven incremental view maintenance: seed once from
  * the base, then every [[refresh]] tails the log with
  * [[ChangeLog.readSince]] and applies the span's net contribution
  * delta. At 100 TB the refresh bill is O(new log entries + |view|);
  * the base table is scanned exactly once, at seed time.
  *
  * Exactly-once without a transaction log: an IVM delta is NOT
  * idempotent (applying a span twice double-counts — unlike
  * [[ChangeLog.replay]], whose images converge), so the consumer
  * position must commit ATOMICALLY with the data. The view rides a
  * constant `_as_of` column through [[MergeUpsert.replaceAll]]'s
  * staged-swap: the table is a single hive partition, so the swap is
  * one directory rename — data and position are the same commit, and
  * a crash at any point leaves either the old view (old position,
  * span re-applies once) or the new view (new position, span never
  * re-applies). The recovery sweep heals a between-renames crash like
  * every other table here.
  *
  * Lifecycle edges, all loud or convergent:
  *  - a refresh with no new entries is a no-op (the stored position
  *    does not advance — advancing would cost a write for nothing);
  *  - a log COLLAPSED past the stored position fails loud inside
  *    `readSince` (re-seed the view; the collapse caller should have
  *    folded only up to `min` over [[asOf]] of every view);
  *  - a view whose every group vanished deletes its partition; the
  *    next refresh finds no state and re-seeds from the base —
  *    correct, at recompute cost;
  *  - single-writer per view, and refreshes must not race the
  *    table's own maintenance (the same discipline as every
  *    maintenance op here).
  */
object MaterializedView {

  private val AsOfCol = "_as_of"

  /** The single hive partition the swap-atomicity rides on. NOT
    * underscore-prefixed: Spark's file index silently ignores `_*`
    * and `.*` paths, so an `_pt=all` partition directory would be
    * invisible to every read — the view would look permanently empty
    * and each refresh would quietly re-seed at full-recompute cost. */
  private val PartCol = "gv_pt"

  /** The log position the persisted view is current AS OF, if the
    * view holds state. Feed `min` over every view's position to
    * [[ChangeLog.checkpoint]] as the collapse watermark. */
  def asOf(spark: SparkSession, viewDir: String): Option[Long] = {
    val p = new Path(viewDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && MergeUpsert.sweepAndHasData(fs, p))
      Some(spark.read.parquet(viewDir)
        .agg(max(col(AsOfCol))).head().getLong(0))
    else None
  }

  /** Seed (first call) or incrementally refresh the view at `viewDir`
    * over the logged table at `tableDir`. `project` maps a base row to
    * its dims + measures (row-local, distributive — the
    * [[CdcView]] contract); `keys` is the TABLE's row key. Returns the
    * log position the view is now current as of. */
  def refresh(spark: SparkSession, tableDir: String, viewDir: String,
              keys: Seq[String], project: DataFrame => DataFrame,
              dims: Seq[String], measures: Seq[String]): Long = {
    val logHw = Incremental
      .highWatermark(spark, ChangeLog.logDir(tableDir)).getOrElse(-1L)
    def persist(v: DataFrame): Unit =
      MergeUpsert.replaceAll(spark, viewDir,
        v.withColumn(PartCol, lit("all")), partitionCol = PartCol)
    asOf(spark, viewDir) match {
      case None =>
        // Seed: one full aggregate of the base, stamped at the log's
        // CURRENT head — every logged effect is already in the base,
        // so the next refresh starts strictly after it.
        val seed = project(
            spark.read.option("mergeSchema", "true").parquet(tableDir))
          .groupBy(dims.map(col): _*)
          .agg(count(lit(1)).as("n_rows"),
            measures.map(m => sum(col(m)).as(m)): _*)
          .select(dims.map(col) ++ measures.map(col) :+
            col("n_rows"): _*)
        persist(seed.withColumn(AsOfCol, lit(logHw)))
        logHw
      case Some(pos) if pos >= logHw => pos // nothing new
      case Some(pos) =>
        val span = ChangeLog.readSince(spark, tableDir, Some(pos))
          .getOrElse(return pos) // log holds no entries at all
        val view = spark.read.parquet(viewDir)
          .drop(AsOfCol).drop(PartCol)
        val next = CdcView.applyDelta(view,
          CdcView.groupDelta(ChangeLog.netDiff(span, keys), keys,
            project, dims, measures),
          dims, measures)
        persist(next.withColumn(AsOfCol, lit(logHw)))
        logHw
    }
  }
}
