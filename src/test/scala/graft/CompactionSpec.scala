package graft

import graft.runtime.Compaction
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Small-file compaction: content preserved cell-for-cell, file counts
  * reduced to what bytes justify, idempotent second run. */
class CompactionSpec extends SparkSpec {

  private def dataFiles(dir: String, part: String): Int = {
    val p = new Path(dir, part)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(f => f.isFile &&
      !f.getPath.getName.startsWith(".") &&
      !f.getPath.getName.startsWith("_"))
  }

  test("compaction merges fragmented partitions and preserves content") {
    val dir = tmpDir("compact")
    val ev = graft.ingest.Events.cleansed(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "ts_us", "event_type", "datetime")
    // Fragment: 8 files per partition.
    ev.repartition(8).write.partitionBy("datetime")
      .mode("overwrite").parquet(dir)
    val parts = spark.read.parquet(dir).select("datetime").distinct()
      .collect().map(r => s"datetime=${r.get(0)}")
    // A date with fewer rows than tasks yields fewer than 8 files, so
    // assert fragmentation, not an exact count.
    val fragmented = parts.filter(p => dataFiles(dir, p) > 1)
    assert(fragmented.nonEmpty)

    val report = Compaction.compact(spark, dir).collect()
    assert(report.length == fragmented.length)
    assert(report.forall(_.getAs[Long]("files_before") > 1L))
    assert(parts.forall(p => dataFiles(dir, p) == 1),
      "every partition should compact to one small file")
    // Content equality against the SOURCE frame (the pre-compaction
    // reader would lazily re-list the now-rewritten files).
    val cols = ev.columns.map(col).toSeq
    val after = spark.read.parquet(dir).select(cols: _*)
    val src = ev.select(cols: _*)
    assert(after.exceptAll(src).isEmpty && src.exceptAll(after).isEmpty,
      "compaction changed table content")

    // Idempotent: nothing left to rewrite.
    assert(Compaction.compact(spark, dir).count() == 0)
  }

  test("recovery sweep heals every crash window before planning") {
    val dir = tmpDir("compact-recover")
    val ev = graft.ingest.Events.cleansed(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "ts_us", "event_type", "datetime")
    ev.repartition(4).write.partitionBy("datetime")
      .mode("overwrite").parquet(dir)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => !n.startsWith(".") && !n.startsWith("_")).sorted
    assert(parts.length >= 2, s"need 2+ partitions, got ${parts.toSeq}")
    val before = spark.read.parquet(dir)
    val cols = before.columns.map(col).toSeq
    val snapshot = before.select(cols: _*).collect().toSet

    // Window 1 — death BETWEEN the renames: partition gone, its data
    // parked in .backup-<uuid>--<partition>, staging complete.
    val p0 = new Path(root, parts(0))
    assert(fs.rename(p0, new Path(root, s".backup-w1--${parts(0)}")))
    fs.mkdirs(new Path(root, ".compact-w1"))
    // Window 2 — death AFTER the swap, before the backup delete: the
    // partition is live, a stale backup of partition 2 lingers.
    fs.mkdirs(new Path(root, s".backup-w2--${parts(1)}"))
    // Window 3 — death mid-staging-write: orphan staging only.
    fs.mkdirs(new Path(root, ".compact-w3"))

    Compaction.compact(spark, dir)

    // All three windows healed: partition 1 restored with its full
    // content, no orphan dot-directories survive, and the table reads
    // back cell-for-cell.
    assert(fs.exists(p0), "between-renames partition must be restored")
    val leftovers = fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith(".backup-") || n.startsWith(".compact-"))
    assert(leftovers.isEmpty, s"orphans survived: ${leftovers.toSeq}")
    assert(spark.read.parquet(dir).select(cols: _*).collect().toSet ==
      snapshot, "recovery changed table content")
  }

  test("recovery sweep parses the legacy single-dash backup naming " +
      "and fails loud on unparseable names") {
    // A pre-round-10 writer parked backups as .backup-<uuid>-<part>
    // (single dash). The sweep must restore those too — the partition
    // name starts at the fixed 36-char-uuid offset.
    val uuid = "123e4567-e89b-42d3-a456-426614174000"
    assert(Compaction.partitionOfBackup(
      s".backup-$uuid-datetime=2024-01-01") == "datetime=2024-01-01")
    // Current two-dash naming still parses (partition may contain
    // dashes of its own).
    assert(Compaction.partitionOfBackup(
      s".backup-$uuid--datetime=2024-01-01") == "datetime=2024-01-01")
    assert(Compaction.partitionOfBackup(
      ".backup-w1--p=1") == "p=1")
    // A partition value may itself contain '--' (escapePathName leaves
    // dashes alone): the uuid-anchored parse must win over a separator
    // search, for BOTH naming generations.
    assert(Compaction.partitionOfBackup(
      s".backup-$uuid-p=a--b") == "p=a--b")
    assert(Compaction.partitionOfBackup(
      s".backup-$uuid--p=a--b") == "p=a--b")
    // Unparseable: neither separator nor a uuid-shaped prefix. Silent
    // skip would report the table healed while a partition stays
    // missing — must throw instead.
    intercept[java.io.IOException] {
      Compaction.partitionOfBackup(".backup-junk")
    }

    // End-to-end: a legacy-named backup with its partition missing is
    // restored by the sweep.
    val dir = tmpDir("compact-legacy")
    val ev = graft.ingest.Events.cleansed(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "ts_us", "event_type", "datetime")
    ev.write.partitionBy("datetime").mode("overwrite").parquet(dir)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(root).map(_.getPath.getName)
      .filter(n => !n.startsWith(".") && !n.startsWith("_")).sorted.head
    val snapshot = spark.read.parquet(dir).collect().length
    assert(fs.rename(new Path(root, part),
      new Path(root, s".backup-$uuid-$part")))
    Compaction.compact(spark, dir)
    assert(fs.exists(new Path(root, part)),
      "legacy-named backup must be restored")
    assert(spark.read.parquet(dir).collect().length == snapshot)
  }
}
