package graft.runtime

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction for a partitioned parquet table — the
  * maintenance job every streaming ingest needs: micro-batches land
  * many small files per partition (SilverLoop's shape), and scan
  * throughput at 100 TB dies by footer count, not bytes.
  *
  * Planning is METADATA-scale: one driver listing per partition
  * directory (the Iceberg-manifest-planning analogue, same discipline
  * as MergeUpsert's affected-value collect). A partition is rewritten
  * only when its file count exceeds what its byte size justifies at
  * `targetBytes` — so the operation is IDEMPOTENT: a second run finds
  * every partition already at its target layout and rewrites nothing.
  *
  * Each rewrite reads ONE partition directory, coalesces to the
  * justified file count (coalesce, not repartition — no shuffle, this
  * is a pure file-merge), writes to a `.compact-<uuid>` staging
  * directory next to the target, and swaps via the MergeUpsert
  * rename protocol (target→backup, staging→target, drop backup), so a
  * crash at any point leaves either the old or the new complete
  * partition, never a half-written one. Partition VALUES never change
  * — the hive directory names are preserved verbatim, so readers'
  * partition pruning is unaffected.
  *
  * Returns a report frame (partition, files_before, files_after,
  * bytes) with one row per REWRITTEN partition; empty means the table
  * was already compact. */
object Compaction {

  def compact(spark: SparkSession, targetDir: String,
              targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    val root = new Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val report = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long)]
    if (fs.exists(root)) {
      val parts = fs.listStatus(root)
        .filter(_.isDirectory)
        .filter(p => !p.getPath.getName.startsWith(".") &&
          !p.getPath.getName.startsWith("_"))
      parts.foreach { p =>
        val files = fs.listStatus(p.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith(".") &&
            !f.getPath.getName.startsWith("_"))
        val bytes = files.map(_.getLen).sum
        val want = math.max(1L,
          (bytes + targetBytes - 1) / targetBytes).toInt
        if (files.length > want) {
          val uuid = java.util.UUID.randomUUID().toString
          val staging = new Path(root, s".compact-$uuid")
          spark.read.parquet(p.getPath.toString)
            .coalesce(want)
            .write.mode("overwrite").parquet(staging.toString)
          // The staging dir holds plain data files (no partition
          // subdir — we wrote one partition's rows without its
          // partition column, which lives in the DIRECTORY name).
          // Swap: target→backup, staging→target, drop backup.
          def renameOrFail(from: Path, to: Path): Unit =
            if (!fs.rename(from, to))
              throw new java.io.IOException(s"rename $from -> $to failed")
          val backup = new Path(root, s".backup-$uuid")
          renameOrFail(p.getPath, backup)
          renameOrFail(staging, p.getPath)
          // _SUCCESS marker from the staging write is now inside the
          // partition dir; it is filtered by readers and by this
          // planner's next listing.
          fs.delete(backup, true)
          report += ((p.getPath.getName, files.length.toLong,
            want.toLong, bytes))
        }
      }
    }
    report.toSeq
      .toDF("partition", "files_before", "files_after", "bytes")
  }
}
