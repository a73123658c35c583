package graft

import graft.runtime.Vacuum
import graft.silver.MergeUpsert
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Warehouse-wide crash-leftover sweep ([[graft.runtime.Vacuum]]):
  * the writers' own per-table recovery applied to tables nobody
  * writes again, plus the recluster protocol's beside-the-table
  * crash shapes. Idempotent; restore-or-drop matches the writers'. */
class VacuumSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType)))

  private def df(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map(r => Row(r._1, r._2)), 2), schema)

  test("one sweep heals every crash shape across the warehouse — " +
      "mid-swap partition backup, orphan staging, recluster backup " +
      "with and without its live dir — and a second sweep is a no-op") {
    val wh = tmpDir("vacuum-wh")
    val fs = new Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // Table A: a mid-swap crash — its only partition sits in a
    // .backup-*, the live name missing. Reads see an EMPTY table
    // until something sweeps; no writer will come.
    val aDir = s"$wh/gold_cold"
    MergeUpsert.replaceAll(spark, aDir,
      df((1L, "g1"), (2L, "g2")), partitionCol = "grp")
    val uuid = java.util.UUID.randomUUID().toString
    assert(fs.rename(new Path(s"$aDir/grp=g1"),
      new Path(s"$aDir/.backup-$uuid--grp=g1")))
    assert(spark.read.parquet(aDir).filter(col("grp") === "g1").isEmpty,
      "fixture: the backed-up partition must read as missing")

    // Table B: an orphan staging dir from a dead writer.
    val bDir = s"$wh/silver_cold"
    MergeUpsert.replaceAll(spark, bDir, df((3L, "g1")),
      partitionCol = "grp")
    fs.mkdirs(new Path(s"$bDir/.staging-$uuid"))

    // Table C: flat-recluster between-renames crash — live dir gone,
    // complete table in the sibling backup, orphan staging beside it.
    val cDir = s"$wh/clustered_cold"
    df((4L, "g1"), (5L, "g2")).write.parquet(cDir)
    assert(fs.rename(new Path(cDir),
      new Path(cDir + ".recluster-backup")))
    fs.mkdirs(new Path(cDir + s".recluster-$uuid"))

    // Table D: recluster post-swap crash — live NEW table present,
    // the stale backup never dropped.
    val dDir = s"$wh/clustered_done"
    df((6L, "g1")).write.parquet(dDir)
    df((99L, "g9")).write.parquet(dDir + ".recluster-backup")

    val report = Vacuum.sweep(spark, wh)
    val kinds = report.map(a => a.kind -> a.dir).toSet
    assert(kinds.exists(k => k._1 === "table-sweep" &&
      k._2.endsWith("gold_cold")))
    assert(kinds.exists(k => k._1 === "table-sweep" &&
      k._2.endsWith("silver_cold")))
    assert(kinds.exists(k => k._1 === "recluster-restore" &&
      k._2.endsWith("clustered_cold")))
    assert(kinds.exists(k => k._1 === "recluster-staging-drop"))
    assert(kinds.exists(k => k._1 === "recluster-backup-drop" &&
      k._2.contains("clustered_done")))

    // Healed: A serves both partitions again, B's orphan is gone,
    // C restored whole, D's live survived and its stale backup died.
    assert(spark.read.parquet(aDir).count() === 2L)
    assert(!fs.exists(new Path(s"$bDir/.staging-$uuid")))
    assert(spark.read.parquet(cDir).count() === 2L)
    assert(!fs.exists(new Path(cDir + s".recluster-$uuid")))
    assert(spark.read.parquet(dDir).collect().map(_.getLong(0)).toSeq
      === Seq(6L))
    assert(!fs.exists(new Path(dDir + ".recluster-backup")))

    // Idempotent: nothing left to do.
    assert(Vacuum.sweep(spark, wh).isEmpty,
      "a second sweep must report zero actions")

    // Sidecar state is untouched by design: underscore/dot siblings
    // and files (positions, registries, pins) never enter the sweep.
    val posFile = new Path(s"$wh/some_view_pos")
    val out = fs.create(posFile, true)
    try out.write("7".getBytes("UTF-8")) finally out.close()
    assert(Vacuum.sweep(spark, wh).isEmpty)
    assert(fs.exists(posFile))
  }
}
