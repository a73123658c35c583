package graft.silver

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S9: idempotent MERGE-INTO rewrite for plain partitioned parquet
  * (reference silver_user_session_events.py:149-186 uses Iceberg MERGE; we
  * have no table format, so: stage → target ⟕anti stage (per affected
  * partition) → union → staged write + partition-directory swap —
  * SURVEY.md §7.3).
  *
  * Scale properties: only partitions present in the staging data are read
  * and rewritten (partition pruning via the collected affected-value list —
  * a metadata-sized driver round-trip, same as Iceberg's manifest
  * planning); the anti-join shuffles only those partitions, keyed by the
  * merge key. Re-running the same stage is a no-op (idempotent), as the
  * anti-join removes every staged key before the union.
  *
  * Crash safety: the merged result is written to a `.staging-<uuid>`
  * directory NEXT TO the target first — the expensive compute/write can
  * fail at any point and the target is untouched (RuntimeSpec simulates
  * exactly that). Each affected partition directory is then swapped in
  * with two filesystem renames (target→backup, staging→target, drop
  * backup) — a metadata-scale window, vs the whole-job window an in-place
  * `mode("overwrite")` leaves where the partition has been deleted but
  * not yet rewritten. A crash between the two renames leaves a
  * `.backup-<uuid>--<partition>` directory with the complete pre-update
  * partition; the shared recovery sweep
  * ([[graft.runtime.Compaction.recoverySweep]], run at the start of
  * every upsert and compact) restores it automatically under the
  * single-writer assumption. True multi-writer snapshot atomicity needs
  * a table format's commit protocol (Iceberg in the reference) —
  * documented as the accepted gap in SURVEY.md §7.3.
  */
object MergeUpsert {

  /** `evolveSchema = true` admits ADDITIVE schema evolution: staged
    * rows may carry columns the target lacks (and vice versa) — the
    * union aligns by name and fills the missing side with NULLs, the
    * parquet-standard widen-with-nulls semantics. The DEFAULT stays
    * strict: a column-set mismatch fails loud, because silently
    * null-filling a typo'd producer schema is exactly how a 100 TB
    * table rots (RuntimeSpec pins both behaviors). Evolution applies
    * only to the affected partitions this upsert rewrites; older
    * partitions keep their files until touched — readers get the
    * merged view via parquet schema merging. */
  def upsert(spark: SparkSession, targetDir: String, stage: DataFrame,
             keyCols: Seq[String], partitionCol: String = "datetime",
             evolveSchema: Boolean = false): Unit = {
    val rootPath = new Path(targetDir)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sweepAndHasData(fs, rootPath)) {
      initialWrite(spark, targetDir, stage, partitionCol)
    } else {
      // Affected partitions only: metadata-scale collect (dates, not rows).
      val affected = stage.select(col(partitionCol)).distinct()
        .collect().map(_.get(0)).toIndexedSeq
      val affectedPred = affectedPredicate(partitionCol, affected)
      // mergeSchema: the target's schema must be the UNION of its
      // files' schemas, not whichever footer Spark happens to sample —
      // after an evolution write, a sampled old footer would silently
      // null out evolved-column values in every partition this upsert
      // rewrites (and make strict-mode upserts of evolved tables fail
      // spuriously). The footer pass is metadata-scale and
      // parallelized; the row filter still prunes to affected
      // partitions.
      val target = spark.read.option("mergeSchema", "true")
        .parquet(targetDir).filter(affectedPred)
      val merged = target
        .join(stage, keyCols, "left_anti")
        .unionByName(stage, allowMissingColumns = evolveSchema)
      // Plain upsert never deletes a partition: every affected value
      // has staged rows by construction, so dropEmpty = Nil.
      writeAndSwap(fs, rootPath, merged, partitionCol, Nil)
    }
  }

  /** Delta-recompute merge with DELETION propagation: `stage` is the
    * COMPLETE recompute of a scope (e.g. the affected users — every
    * staged row must lie inside `scope`, which the caller guarantees by
    * deriving the stage from a scope semi-join). Within that scope the
    * target converges to the stage EXACTLY, including deletions: scope
    * rows absent from the stage are dropped — the case plain [[upsert]]
    * cannot express, because its anti-join-union keeps any target row
    * whose key vanished from the stage.
    *
    * Affected partitions are the union of the stage's partition values
    * and the partition values where the scope currently has TARGET rows
    * — a vanished grain has no staged row, but its old partition must
    * still rewrite (the scope-side scan is column-pruned to
    * (scopeCols, partitionCol); at 100 TB a scope-bucketed layout
    * prunes it further). A partition whose rewrite comes out EMPTY is
    * deleted via the trash protocol (scaladoc on [[dropPartitions]]).
    * Idempotent: re-running the same stage re-derives the same scope
    * rows. */
  def upsertScoped(spark: SparkSession, targetDir: String, stage: DataFrame,
                   scopeCols: Seq[String], scope: DataFrame,
                   partitionCol: String = "datetime"): Unit = {
    val rootPath = new Path(targetDir)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sweepAndHasData(fs, rootPath)) {
      initialWrite(spark, targetDir, stage, partitionCol)
    } else {
      val target = spark.read.option("mergeSchema", "true").parquet(targetDir)
      val stagedVals = stage.select(col(partitionCol)).distinct()
        .collect().map(_.get(0)).toIndexedSeq
      val scopeVals = target
        .join(scope.select(scopeCols.map(col): _*).distinct(),
          scopeCols, "left_semi")
        .select(col(partitionCol)).distinct().collect()
        .map(_.get(0)).toIndexedSeq
      val affected = (stagedVals ++ scopeVals).distinct
      if (affected.isEmpty) return // nothing staged, scope has no rows
      val kept = target.filter(affectedPredicate(partitionCol, affected))
        .join(scope.select(scopeCols.map(col): _*).distinct(),
          scopeCols, "left_anti")
      writeAndSwap(fs, rootPath, kept.unionByName(stage),
        partitionCol, affected.map(partitionDirName(partitionCol, _)))
    }
  }

  /** Replace exactly the partitions of `partitionVals` with the stage's
    * rows — the date-grain delta-recompute shape, where the stage IS the
    * complete recompute of those partitions (so target rows there are
    * dropped wholesale, and a partition with no staged rows at all is
    * DELETED — the all-grains-vanished case). Partitions outside the
    * list are untouched. Same staging-write + rename-swap crash
    * protocol as [[upsert]]. */
  def replacePartitions(spark: SparkSession, targetDir: String,
                        stage: DataFrame, partitionVals: Seq[Any],
                        partitionCol: String = "datetime"): Unit = {
    val rootPath = new Path(targetDir)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sweepAndHasData(fs, rootPath)) {
      initialWrite(spark, targetDir, stage, partitionCol)
    } else {
      // Safety union: a staged value outside the declared list would
      // otherwise swap in while its siblings' stale rows survive.
      val stagedVals = stage.select(col(partitionCol)).distinct()
        .collect().map(_.get(0)).toIndexedSeq
      val affected = (partitionVals ++ stagedVals).distinct
      if (affected.isEmpty) return
      // The stage passes through unfiltered: `affected` is a superset
      // of the staged partition values by construction, so a filter on
      // it would be dead code costing one per-row evaluation.
      writeAndSwap(fs, rootPath, stage,
        partitionCol, affected.map(partitionDirName(partitionCol, _)))
    }
  }

  /** Converge the WHOLE table to the stage — the full-recompute shape
    * ([[graft.runtime.Pipeline.runDaily]]'s silver and gold writes):
    * the stage is the complete recompute of the entire table, so every
    * target partition either swaps to its staged form or — when the
    * recompute no longer produces it at all — is deleted. The keyed
    * [[upsert]] cannot express either deletion, and a dynamic
    * partition overwrite misses the vanished-partition case (it only
    * touches partitions present in the written data). The drop set
    * comes from LISTING the target's partition directories, so this
    * mode needs no value→path encoding at all — it is safe for every
    * partition-column type. Same staging-write + rename-swap crash
    * protocol; idempotent. */
  def replaceAll(spark: SparkSession, targetDir: String, stage: DataFrame,
                 partitionCol: String = "datetime"): Unit = {
    val rootPath = new Path(targetDir)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sweepAndHasData(fs, rootPath)) {
      initialWrite(spark, targetDir, stage, partitionCol)
    } else {
      val existingDirs = fs.listStatus(rootPath)
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith(s"$partitionCol=")).toIndexedSeq
      writeAndSwap(fs, rootPath, stage, partitionCol, existingDirs)
    }
  }

  /** Shared preamble of every merge mode: heal a previous writer's
    * crash leftovers FIRST (the shared rename-swap recovery,
    * [[graft.runtime.Compaction.recoverySweep]] — a between-renames
    * backup is restored to its partition, stale backups and orphan
    * staging/compact/trash dirs drop; single-writer-per-table
    * assumption), THEN decide whether the target holds data. The sweep
    * must run before the existence decision, not after: a table whose
    * only contents are a crashed writer's `.backup-*` would otherwise
    * read as empty and the initial write would destroy the backup. The
    * data check counts only VISIBLE entries — a table the
    * delete-capable modes emptied down to its `_SUCCESS` marker is a
    * legitimate state, and must take the initial-write branch (reading
    * it for a merge would fail schema inference). */
  private[graft] def sweepAndHasData(fs: org.apache.hadoop.fs.FileSystem,
                                     rootPath: Path): Boolean = {
    if (!fs.exists(rootPath)) return false
    graft.runtime.Compaction.recoverySweep(fs, rootPath)
    fs.listStatus(rootPath).exists { st =>
      val n = st.getPath.getName
      !n.startsWith(".") && !n.startsWith("_")
    }
  }

  /** isin() never matches NULL (SQL three-valued logic), so a null
    * partition value needs its own predicate. */
  private def affectedPredicate(partitionCol: String,
                                affected: Seq[Any]) = {
    val nonNull = affected.filter(_ != null)
    val p = col(partitionCol).isin(nonNull: _*)
    if (affected.contains(null)) p || col(partitionCol).isNull else p
  }

  /** Hive partition directory name for one value — the value→path
    * encoding Spark's writers use. Only the DELETE side of the scoped
    * modes needs it (the swap side derives names by listing the staging
    * output, which sidesteps encoding entirely; a partition that must
    * VANISH has no staged rows to list). Covers the scalar types whose
    * toString matches Spark's hive formatting — Date, String, integers,
    * the partition-column types this codebase uses; null takes the hive
    * default-partition name. */
  private[graft] def partitionDirName(partitionCol: String, v: Any): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    v match {
      case null | _: String | _: java.sql.Date | _: java.time.LocalDate |
          _: java.lang.Integer | _: java.lang.Long | _: java.lang.Short |
          _: java.lang.Byte | _: java.lang.Boolean => ()
      case other => throw new IllegalArgumentException(
        s"partition value type ${other.getClass.getName} is not supported " +
          "by the delete-capable merge modes: its toString does not match " +
          "Spark's hive partition-path formatting (e.g. Timestamp drops " +
          "the '.0'), so a vanished partition would be silently skipped " +
          "instead of deleted — use replaceAll (listing-based, " +
          "encoding-free) or a supported partition type")
    }
    val s =
      if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      else ExternalCatalogUtils.escapePathName(v.toString)
    s"$partitionCol=$s"
  }

  /** Drop partition directories via the TRASH protocol: rename to
    * `.trash-<uuid>` (one atomic rename — the partition vanishes in a
    * single metadata operation), then delete the trash dir. A crash
    * between the two leaves a `.trash-*` directory that the shared
    * recovery sweep DELETES on the next run — deliberately a different
    * name class from `.backup-*`, whose sweep semantics are "restore if
    * the partition is missing": a trash name means this data is DEAD,
    * so recovery completes the delete instead of resurrecting stale
    * rows. */
  private[graft] def dropPartitions(spark: SparkSession, targetDir: String,
                                    partitionCol: String,
                                    vals: Seq[Any]): Unit = {
    val rootPath = new Path(targetDir)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dropPartitionDirs(fs, rootPath,
      vals.map(partitionDirName(partitionCol, _)))
  }

  private def dropPartitionDirs(fs: org.apache.hadoop.fs.FileSystem,
                                rootPath: Path,
                                dirNames: Seq[String]): Unit =
    dirNames.foreach { part =>
      val tgt = new Path(rootPath, part)
      if (fs.exists(tgt)) {
        val trash = new Path(rootPath,
          s".trash-${java.util.UUID.randomUUID().toString}")
        if (!fs.rename(tgt, trash))
          throw new java.io.IOException(s"trash rename $tgt -> $trash failed")
        fs.delete(trash, true)
      }
    }

  /** Shared tail of every merge mode: write `merged` to a
    * `.staging-<uuid>` directory, swap each produced partition in via
    * the two-rename protocol, then drop the `dropIfEmpty` partitions
    * that received NO staged rows (empty rewrite = the partition's last
    * rows vanished). Swap names come from LISTING the staging output —
    * deriving them from values would have to reproduce Spark's
    * partition-path encoding exactly (escaped chars, timestamp
    * formatting, null → __HIVE_DEFAULT_PARTITION__); only the delete
    * side, which has nothing to list, uses [[partitionDirName]]. */
  private def writeAndSwap(fs: org.apache.hadoop.fs.FileSystem,
                           rootPath: Path, merged: DataFrame,
                           partitionCol: String,
                           dropIfEmpty: Seq[String]): Unit = {
    val uuid = java.util.UUID.randomUUID().toString
    val stagingDir = new Path(rootPath, s".staging-$uuid")
    merged.write.partitionBy(partitionCol).mode("overwrite")
      .parquet(stagingDir.toString)
    def renameOrFail(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"rename $from -> $to failed")
    try {
      val written = fs.listStatus(stagingDir)
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(s"$partitionCol="))
        .map(_.getPath.getName)
      written.foreach { part =>
        val tgt = new Path(rootPath, part)
        val stg = new Path(stagingDir, part)
        // Backup name ENCODES the partition (shared BackupSep
        // convention) so the recovery sweep can restore it.
        val bak = new Path(rootPath,
          s".backup-$uuid${graft.runtime.Compaction.BackupSep}$part")
        if (fs.exists(tgt)) renameOrFail(tgt, bak)
        renameOrFail(stg, tgt)
        if (fs.exists(bak)) fs.delete(bak, true)
      }
      dropPartitionDirs(fs, rootPath,
        dropIfEmpty.filterNot(written.toSet))
      // Writer-maintained file skipping: a table pinned by
      // [[graft.runtime.DataSkipping.enablePartitioned]] gets the
      // rewritten leaves' zone maps reconciled HERE, in the writer —
      // the sidecar can never go stale under this path. Unpinned
      // tables (the common case — logs, views, stores) pay one
      // fs.exists. Ordering: after the swap, so a crash before this
      // line leaves covered != live, which the scan rejects LOUDLY —
      // the fail-loud-never-wrong contract, and the retry's
      // writeAndSwap re-runs maintenance. Dropped partitions need no
      // step (their sidecars died with the directory).
      graft.runtime.DataSkipping.maintain(merged.sparkSession,
        rootPath.toString, written.toIndexedSeq)
    } finally fs.delete(stagingDir, true)
  }

  /** The shared initial-write branch: a plain partitioned overwrite,
    * followed by the same writer-maintained skipping reconcile as
    * [[writeAndSwap]] (all leaves — an initial write after
    * [[graft.runtime.DataSkipping.enablePartitioned]] happens when a
    * table was emptied and re-seeded). */
  private def initialWrite(spark: SparkSession, targetDir: String,
                           stage: DataFrame, partitionCol: String): Unit = {
    stage.write.partitionBy(partitionCol).mode("overwrite")
      .parquet(targetDir)
    graft.runtime.DataSkipping.maintain(spark, targetDir, Seq.empty)
  }
}
