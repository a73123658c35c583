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
    val targetExists = fs.exists(rootPath) && fs.listStatus(rootPath).nonEmpty
    if (!targetExists) {
      stage.write.partitionBy(partitionCol).mode("overwrite")
        .parquet(targetDir)
    } else {
      // Heal any previous writer's crash leftovers BEFORE planning —
      // the shared rename-swap recovery (Compaction.recoverySweep):
      // a between-renames backup is restored to its partition, stale
      // backups and orphan staging/compact dirs drop. Same
      // single-writer-per-table assumption as the swap itself.
      graft.runtime.Compaction.recoverySweep(fs, rootPath)
      // Affected partitions only: metadata-scale collect (dates, not rows).
      val affected = stage.select(col(partitionCol)).distinct()
        .collect().map(_.get(0))
      val (nonNullVals, hasNull) =
        (affected.filter(_ != null), affected.contains(null))
      // isin() never matches NULL (SQL three-valued logic), so a null
      // partition value needs its own predicate or its pre-existing
      // target rows would be silently dropped by the swap.
      val affectedPred = {
        val p = col(partitionCol).isin(nonNullVals.toIndexedSeq: _*)
        if (hasNull) p || col(partitionCol).isNull else p
      }
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
      val uuid = java.util.UUID.randomUUID().toString
      val stagingDir = new Path(targetDir, s".staging-$uuid")
      merged.write.partitionBy(partitionCol).mode("overwrite")
        .parquet(stagingDir.toString)
      def renameOrFail(from: Path, to: Path): Unit =
        if (!fs.rename(from, to))
          throw new java.io.IOException(s"rename $from -> $to failed")
      // Swap the partition directories the staging write ACTUALLY
      // produced (one per affected value, by construction — every
      // affected value has staged rows). Deriving names from the values
      // would have to reproduce Spark's partition-path encoding exactly
      // (escaped chars, timestamp formatting, null →
      // __HIVE_DEFAULT_PARTITION__) — listing sidesteps the whole class.
      try {
        fs.listStatus(stagingDir)
          .filter(s => s.isDirectory &&
            s.getPath.getName.startsWith(s"$partitionCol="))
          .map(_.getPath.getName)
          .foreach { part =>
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
      } finally fs.delete(stagingDir, true)
    }
  }
}
