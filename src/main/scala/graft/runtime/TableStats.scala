package graft.runtime

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout accounting: per-table data-file count and byte
  * totals — the metadata [[Compaction]]'s planner decides on, exposed
  * as a queryable frame (the `SELECT * FROM table.files` surface an
  * Iceberg user gets, reduced to the numbers the C4 file-count gate
  * and a compaction monitor actually read).
  *
  * Pure driver-side filesystem metadata — one `listStatus` per table
  * (recursive only into partition subdirectories), no executor work at
  * all; at 100 TB this costs exactly what Compaction's planning pass
  * costs, by construction. Hidden entries (`_SUCCESS`, dotfiles — the
  * reader-filter convention shared with Compaction) are excluded, so
  * the numbers describe the DATA a scan would actually plan.
  *
  * The oracle is the real filesystem: DuckDB's `read_blob` sizes the
  * same files independently (OpsOracles.tableFileStats), so an
  * engine-side listing bug — phantom files, missed partitions, hidden
  * files counted — hash-fails instead of self-confirming. */
object TableStats {

  /** The harness table set (tools/check.py's TABLES). */
  val Tables: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** sfDir of the last run — interpolated into the oracle's read_blob
    * paths after the query runs (the Bpe.lastLearned convention:
    * Verify emits oracle_sql.json only after every query). */
  @volatile private[graft] var lastDir: String = ""

  /** (table_name, n_files, total_bytes) per harness table: single
    * parquet files count as one file; a directory-backed table counts
    * its visible data files across partition subdirectories. */
  def tableFileStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lastDir = dir
    val conf = s.sparkContext.hadoopConfiguration
    val rows = Tables.map { t =>
      val p = new Path(s"$dir/$t.parquet")
      val fs = p.getFileSystem(conf)
      def visible(n: String) = !n.startsWith(".") && !n.startsWith("_")
      def walk(d: Path): Seq[Long] =
        fs.listStatus(d).toSeq.flatMap { st =>
          if (!visible(st.getPath.getName)) Seq.empty
          else if (st.isFile) Seq(st.getLen)
          else walk(st.getPath)
        }
      val sizes =
        if (!fs.exists(p)) Seq.empty
        else if (fs.getFileStatus(p).isFile) Seq(fs.getFileStatus(p).getLen)
        else walk(p)
      (t, sizes.length.toLong, sizes.sum)
    }
    rows.toDF("table_name", "n_files", "total_bytes")
  }
}
