package graft

import graft.ingest.Events
import graft.runtime.{ChangeLog, Incremental, Pipeline}
import graft.silver.MergeUpsert
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time travel from the change log ([[ChangeLog.snapshotAt]] /
  * [[Pipeline.warehouseAt]]): every historical position of a
  * merge-maintained table must reconstruct exactly from the CURRENT
  * table plus later entries' pre-images — adds unwind to absence,
  * removals resurrect, changes restore their o_images, untouched
  * rows carry current — behind the collapse boundary fails loud, and
  * one position names a CONSISTENT multi-table warehouse state. */
class SnapshotAtSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("m", LongType)))

  private def df(rows: (Long, Long)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2)), 2), schema)
      .withColumn("pt", lit("all"))

  private def cells(d: DataFrame): Seq[Seq[String]] = {
    val cols = d.columns.sorted
    d.select(cols.map(col): _*).collect()
      .map(r => cols.indices.map(i => String.valueOf(r.get(i))).toSeq)
      .toSeq.sortBy(_.mkString("|"))
  }

  // Same shapes as Scd2Spec: changes, removals, re-adds, transients.
  private val s0 = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
  private val s1 = Seq((1L, 10L), (2L, 20L), (4L, 40L), (5L, 50L),
    (7L, 70L))
  private val s2 = Seq((1L, 10L), (2L, 21L), (5L, 50L))
  private val s3 = Seq((1L, 10L), (2L, 21L), (3L, 31L), (5L, 55L),
    (6L, 60L))
  private val states = Seq(s0, s1, s2, s3)

  test("snapshotAt(p) == historical state for every position; " +
      "behind the collapse boundary fails loud") {
    val dir = tmpDir("snapat") + "/t"
    MergeUpsert.replaceAll(spark, dir, df(s0: _*), partitionCol = "pt")
    Seq(s1, s2, s3).zipWithIndex.foreach { case (st, i) =>
      ChangeLog.recordBatch(spark, dir, Seq("id"), i + 1L)(
        MergeUpsert.replaceAll(spark, dir, df(st: _*),
          partitionCol = "pt"))
    }
    states.zipWithIndex.foreach { case (st, p) =>
      assert(cells(ChangeLog.snapshotAt(spark, dir, Seq("id"),
          p.toLong).drop("pt")) === cells(df(st: _*).drop("pt")),
        s"snapshot at $p")
    }
    // Collapse 0..2 into one net base entry: positions < 2 become
    // unreachable — loud, never a wrong reconstruction — while the
    // boundary and later positions still reconstruct.
    assert(ChangeLog.checkpoint(spark, dir, Seq("id"), upToBatch = 2L))
    assert(cells(ChangeLog.snapshotAt(spark, dir, Seq("id"), 2L)
        .drop("pt")) === cells(df(s2: _*).drop("pt")),
      "boundary position survives the fold")
    val e = intercept[IllegalArgumentException](
      ChangeLog.snapshotAt(spark, dir, Seq("id"), 1L))
    assert(e.getMessage.contains("collapse boundary"))
  }

  test("a table emptied by its last batch still reconstructs every " +
      "earlier position — the history rides the log alone") {
    import spark.implicits._
    val dir = tmpDir("snapat-empty") + "/t"
    MergeUpsert.replaceAll(spark, dir, df(s0: _*), partitionCol = "pt")
    ChangeLog.recordBatch(spark, dir, Seq("id"), 1L)(
      MergeUpsert.replaceAll(spark, dir, df(s1: _*), partitionCol = "pt"))
    // Batch 2 removes EVERYTHING: no parquet footer survives.
    ChangeLog.recordBatch(spark, dir, Seq("id"), 2L)(
      graft.silver.MergeUpsert.upsertScoped(spark, dir,
        spark.read.parquet(dir).filter(lit(false)),
        Seq("pt"), Seq("all").toDF("pt"), partitionCol = "pt"))
    assert(cells(ChangeLog.snapshotAt(spark, dir, Seq("id"), 1L)
        .drop("pt")) === cells(df(s1: _*).drop("pt")),
      "pre-wipe position must reconstruct from pre-images alone")
    assert(ChangeLog.snapshotAt(spark, dir, Seq("id"), 2L).isEmpty,
      "the wiped position is empty")
  }

  test("warehouseAt: one position names the consistent multi-table " +
      "state an update left behind") {
    val allRaw = Events.raw(spark, "/root/testdata/sf0.001")
    val dts = allRaw.select(to_date(col("ts")).as("d")).distinct()
      .collect().map(_.getDate(0)).sortBy(_.getTime).take(4)
    val raw = allRaw.filter(to_date(col("ts")) <= lit(dts.last))
      .localCheckpoint()
    val bronze = tmpDir("snapat-bronze")
    val wh = tmpDir("snapat-wh")
    var wm: Option[Long] = None
    var snapAt1: Map[String, DataFrame] = Map.empty
    Seq(dts(1), dts.last).zipWithIndex.foreach { case (hi, i) =>
      Incremental.appendBatch(spark, bronze,
        raw.filter(to_date(col("ts")) <= lit(hi) &&
          (if (i == 0) lit(true)
           else to_date(col("ts")) > lit(dts(1)))), i + 1L)
      wm = Pipeline.runDailyIncremental(spark, bronze, wh, wm)
      if (i == 0)
        snapAt1 = Pipeline.loggedTables.map { case (t, _) =>
          t -> spark.read.parquet(s"$wh/$t").localCheckpoint()
        }.toMap
    }
    assert(wm.contains(2L))
    val travelled = Pipeline.warehouseAt(spark, wh, pos = 1L)
    assert(travelled.keySet === Pipeline.loggedTables.map(_._1).toSet)
    travelled.foreach { case (t, got) =>
      val exp = snapAt1(t).select(got.columns.map(col): _*)
      assert(cells(got) === cells(exp), s"$t at position 1")
    }
  }
}
