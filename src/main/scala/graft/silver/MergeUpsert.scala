package graft.silver

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S9: idempotent MERGE-INTO rewrite for plain partitioned parquet
  * (reference silver_user_session_events.py:149-186 uses Iceberg MERGE; we
  * have no table format, so: stage → target ⟕anti stage (per affected
  * partition) → union → dynamic partition overwrite — SURVEY.md §7.3).
  *
  * Scale properties: only partitions present in the staging data are read
  * and rewritten (partition pruning via the collected affected-value list —
  * a metadata-sized driver round-trip, same as Iceberg's manifest planning);
  * the anti-join shuffles only those partitions, keyed by the merge key.
  * `localCheckpoint` breaks lineage so the overwrite does not race the scan
  * of the same path. Re-running the same stage is a no-op (idempotent), as
  * the anti-join removes every staged key before the union.
  */
object MergeUpsert {

  def upsert(spark: SparkSession, targetDir: String, stage: DataFrame,
             keyCols: Seq[String], partitionCol: String = "datetime"): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val targetExists = {
      val p = new org.apache.hadoop.fs.Path(targetDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(p) && fs.listStatus(p).nonEmpty
    }
    if (!targetExists) {
      stage.write.partitionBy(partitionCol).mode("overwrite")
        .parquet(targetDir)
    } else {
      // Affected partitions only: metadata-scale collect (dates, not rows).
      val affected = stage.select(col(partitionCol)).distinct()
        .collect().map(_.get(0))
      val target = spark.read.parquet(targetDir)
        .filter(col(partitionCol).isin(affected.toIndexedSeq: _*))
      val merged = target
        .join(stage, keyCols, "left_anti")
        .unionByName(stage)
        .localCheckpoint() // cut lineage: we overwrite the path we read
      merged.write.partitionBy(partitionCol).mode("overwrite")
        .parquet(targetDir)
    }
  }
}
