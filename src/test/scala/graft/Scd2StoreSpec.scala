package graft

import graft.runtime.{ChangeLog, Consumers, Incremental, Scd2Store}
import graft.silver.MergeUpsert
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained SCD2 store ([[graft.runtime.Scd2Store]]):
  * per-batch refreshes must land cell-identical to the from-scratch
  * [[graft.ops.Scd2.fromLog]] rebuild at every step (tombstones,
  * re-adds and transients included — the event-set-as-facts
  * contract); a replayed span converges instead of double-applying; a
  * refresh rewrites ONLY the buckets its span touches; and the store
  * registers as a log consumer so retention can never outrun it. */
class Scd2StoreSpec extends SparkSpec {

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

  // Same shapes as Scd2Spec: change chains, a transient, a re-add,
  // an only-ever-removed baseline key.
  private val s0 = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
  private val s1 = Seq((1L, 10L), (2L, 20L), (4L, 40L), (5L, 50L),
    (7L, 70L))
  private val s2 = Seq((1L, 10L), (2L, 21L), (5L, 50L))
  private val s3 = Seq((1L, 10L), (2L, 21L), (3L, 31L), (5L, 55L),
    (6L, 60L))

  private def rebuild(dir: String): DataFrame =
    ChangeLog.scd2(spark, dir, Seq("id"), basePosition = 0L)

  test("per-batch incremental refreshes == from-scratch rebuild at " +
      "every step; a replayed span converges; only touched buckets " +
      "rewrite") {
    val base = tmpDir("scd2store")
    val dir = s"$base/t"
    val store = s"$base/store"
    MergeUpsert.replaceAll(spark, dir, df(s0: _*), partitionCol = "pt")
    Scd2Store.refresh(spark, dir, store, Seq("id"), basePosition = 0L)
    // Seed serves the all-baseline dimension.
    assert(cells(Scd2Store.read(spark, store).drop("pt")) ===
      cells(df(s0: _*).drop("pt")
        .withColumn("valid_from", lit(0L))
        .withColumn("valid_to", lit(null).cast("long"))
        .withColumn("is_current", lit(true))))

    Seq(s1, s2, s3).zipWithIndex.foreach { case (st, i) =>
      ChangeLog.recordBatch(spark, dir, Seq("id"), i + 1L)(
        MergeUpsert.replaceAll(spark, dir, df(st: _*),
          partitionCol = "pt"))
      val pos = Scd2Store.refresh(spark, dir, store, Seq("id"))
      assert(pos === i + 1L)
      assert(cells(Scd2Store.read(spark, store).drop("pt")) ===
        cells(rebuild(dir).drop("pt")), s"after batch ${i + 1}")
    }

    // Store registered as a consumer at the head; retention respects it.
    val reg = Consumers.list(spark, dir)
    assert(reg.exists(r => r.name.startsWith("scd2-") &&
      r.position === 3L && r.viewDir.contains(store)))

    // Replayed span (crash before the position file committed): force
    // the position back and re-refresh — the event dedup must make it
    // a no-op, not a double-apply.
    val before = cells(Scd2Store.read(spark, store).drop("pt"))
    Incremental.saveWatermark(spark, store + "_pos", 1L)
    Scd2Store.refresh(spark, dir, store, Seq("id"))
    assert(cells(Scd2Store.read(spark, store).drop("pt")) === before,
      "replaying batches 2..3 over an already-updated store must " +
        "converge")

    // Touched-bucket pruning: a batch touching one key rewrites only
    // that key's bucket partition.
    val fs = new Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mtimes0 = fs.listStatus(new Path(store))
      .filter(_.getPath.getName.startsWith("bucket="))
      .map(st => st.getPath.getName ->
        fs.listStatus(st.getPath).map(_.getModificationTime).max).toMap
    Thread.sleep(1100) // mtime granularity
    ChangeLog.recordBatch(spark, dir, Seq("id"), 4L)(
      MergeUpsert.replaceAll(spark, dir,
        df(s3.map { case (k, m) => if (k == 1L) (k, 11L) else (k, m) }
          : _*), partitionCol = "pt"))
    Scd2Store.refresh(spark, dir, store, Seq("id"))
    val mtimes1 = fs.listStatus(new Path(store))
      .filter(_.getPath.getName.startsWith("bucket="))
      .map(st => st.getPath.getName ->
        fs.listStatus(st.getPath).map(_.getModificationTime).max).toMap
    val rewritten = mtimes1.filter { case (b, t) =>
      mtimes0.get(b).forall(_ != t)
    }.keySet
    assert(rewritten.size === 1,
      s"one touched key must rewrite exactly one bucket, got $rewritten")
    assert(cells(Scd2Store.read(spark, store).drop("pt")) ===
      cells(rebuild(dir).drop("pt")), "after the single-key batch")
  }

  test("compliance invalidation: a purge that marks the store " +
      "invalid forces a re-seed — the purged key's version history " +
      "stops serving") {
    val base = tmpDir("scd2store-forget")
    val dir = s"$base/t"
    val store = s"$base/store"
    MergeUpsert.replaceAll(spark, dir, df(s0: _*), partitionCol = "pt")
    Seq(s1, s2, s3).zipWithIndex.foreach { case (st, i) =>
      ChangeLog.recordBatch(spark, dir, Seq("id"), i + 1L)(
        MergeUpsert.replaceAll(spark, dir, df(st: _*),
          partitionCol = "pt"))
    }
    Scd2Store.refresh(spark, dir, store, Seq("id"), basePosition = 0L)
    assert(Scd2Store.read(spark, store)
      .filter(col("id") === 2L).count() === 2L,
      "id 2 has two versions pre-purge")

    // The Forget/Retention move: erase key 2 from table + log, mark
    // every registered consumer invalid.
    val keep = !(col("id") <=> lit(2L))
    MergeUpsert.replaceAll(spark, dir,
      spark.read.parquet(dir).filter(keep), partitionCol = "pt")
    ChangeLog.purge(spark, dir, keep)
    Consumers.list(spark, dir).flatMap(_.viewDir)
      .foreach(graft.runtime.MaterializedView.invalidate(spark, _))
    assert(graft.runtime.MaterializedView.isInvalid(spark, store))

    // The next refresh re-seeds from the purged base + log: key 2's
    // HISTORICAL IMAGES are gone — the one failure a version store
    // cannot have after an erasure.
    Scd2Store.refresh(spark, dir, store, Seq("id"), basePosition = 0L)
    assert(Scd2Store.read(spark, store)
      .filter(col("id") === 2L).isEmpty,
      "purged key's versions must stop serving")
    assert(cells(Scd2Store.read(spark, store).drop("pt")) ===
      cells(rebuild(dir).drop("pt")),
      "re-seeded store == rebuild over the purged history")
  }

  test("the bucket layout pins at seed: refreshing with an explicit " +
      "different count fails loud; the default ask follows the pin") {
    val base = tmpDir("scd2store-buckets")
    val dir = s"$base/t"
    val store = s"$base/store"
    MergeUpsert.replaceAll(spark, dir, df(s0: _*), partitionCol = "pt")
    ChangeLog.recordBatch(spark, dir, Seq("id"), 1L)(
      MergeUpsert.replaceAll(spark, dir, df(s1: _*), partitionCol = "pt"))
    Scd2Store.refresh(spark, dir, store, Seq("id"), basePosition = 0L,
      buckets = 8)
    ChangeLog.recordBatch(spark, dir, Seq("id"), 2L)(
      MergeUpsert.replaceAll(spark, dir, df(s2: _*), partitionCol = "pt"))
    val e = intercept[RuntimeException](
      Scd2Store.refresh(spark, dir, store, Seq("id"), buckets = 16))
    assert(e.getMessage.contains("seeded with 8 buckets"))
    // The default ask silently follows the pinned 8-bucket layout.
    Scd2Store.refresh(spark, dir, store, Seq("id"))
    assert(cells(Scd2Store.read(spark, store).drop("pt")) ===
      cells(rebuild(dir).drop("pt")))
  }

  test("history compaction: archive + live == full history; the live " +
      "store drops to live-set size; refreshes after the split stay " +
      "correct; the split is idempotent") {
    val base = tmpDir("scd2store-archive")
    val dir = s"$base/t"
    val store = s"$base/store"
    MergeUpsert.replaceAll(spark, dir, df(s0: _*), partitionCol = "pt")
    Seq(s1, s2, s3).zipWithIndex.foreach { case (st, i) =>
      ChangeLog.recordBatch(spark, dir, Seq("id"), i + 1L)(
        MergeUpsert.replaceAll(spark, dir, df(st: _*),
          partitionCol = "pt"))
    }
    Scd2Store.refresh(spark, dir, store, Seq("id"), basePosition = 0L)
    val fullBefore = cells(rebuild(dir).drop("pt"))

    // Past the committed position fails loud — a crashed refresh's
    // replay could re-derive archived events into the live set.
    val e = intercept[RuntimeException](
      Scd2Store.archive(spark, store, closedBefore = 99L))
    assert(e.getMessage.contains("committed position"))

    // Move everything that closed strictly before position 3:
    // versions 20/30/40/70 and the tombstones that closed 30/40/70.
    val moved = Scd2Store.archive(spark, store, closedBefore = 3L)
    assert(moved === 7L, "4 closed versions (20/30/40/70) + the 3 " +
      s"tombstones that closed 30/40/70, got $moved")
    // Not one row of history lost...
    assert(cells(Scd2Store.readHistory(spark, store).drop("pt")) ===
      fullBefore, "archive + live must equal the full rebuild")
    // ...and the live store now holds ONLY the live set: no version
    // that closed before the cutoff survives in a live bucket.
    val live = spark.read.option("mergeSchema", "true").parquet(store)
    assert(live.filter(col("is_open") && col("valid_to") < lit(3L))
      .isEmpty, "live buckets must not keep pre-cutoff closed versions")
    // The live serving shape is exactly the rebuild MINUS the
    // archived prefix — the at-or-past-cutoff slice.
    assert(cells(Scd2Store.read(spark, store).drop("pt")) ===
      cells(rebuild(dir).drop("pt")
        .filter(col("valid_to").isNull || col("valid_to") >= lit(3L))),
      "live == the at-or-past-cutoff slice of the rebuild")

    // Idempotent: a second run at the same cutoff moves nothing.
    assert(Scd2Store.archive(spark, store, closedBefore = 3L) === 0L)

    // A refresh AFTER the split stays correct — including a RE-ADD of
    // an archived key (its tombstone + old version live in the
    // archive; the bucket recompute sees only the new open, and the
    // interval algebra's closed-prefix independence keeps both sides
    // exact).
    ChangeLog.recordBatch(spark, dir, Seq("id"), 4L)(
      MergeUpsert.replaceAll(spark, dir,
        df((s3.filterNot(_._1 == 2L) :+ (2L, 22L) :+ (4L, 41L)): _*),
        partitionCol = "pt"))
    Scd2Store.refresh(spark, dir, store, Seq("id"))
    assert(cells(Scd2Store.read(spark, store)
        .filter(col("is_current")).drop("pt")) ===
      cells(rebuild(dir).filter(col("is_current")).drop("pt")),
      "current set after post-split batch")
    assert(cells(Scd2Store.readHistory(spark, store).drop("pt")) ===
      cells(rebuild(dir).drop("pt")),
      "full history after post-split batch == the from-scratch rebuild")
  }

  test("compliance invalidation reaches the archive: a purge re-seeds " +
      "the store AND deletes the archived historical images") {
    val base = tmpDir("scd2store-archive-forget")
    val dir = s"$base/t"
    val store = s"$base/store"
    MergeUpsert.replaceAll(spark, dir, df(s0: _*), partitionCol = "pt")
    Seq(s1, s2, s3).zipWithIndex.foreach { case (st, i) =>
      ChangeLog.recordBatch(spark, dir, Seq("id"), i + 1L)(
        MergeUpsert.replaceAll(spark, dir, df(st: _*),
          partitionCol = "pt"))
    }
    Scd2Store.refresh(spark, dir, store, Seq("id"), basePosition = 0L)
    Scd2Store.archive(spark, store, closedBefore = 3L)
    assert(!Scd2Store.readHistory(spark, store)
      .filter(col("id") === 4L).isEmpty,
      "fixture: id 4's closed version serves from the archive")

    // Purge id 4 (its only versions are ARCHIVED — the re-seed alone
    // would not touch them; the invalidation must reach the sibling).
    val keep = !(col("id") <=> lit(4L))
    MergeUpsert.replaceAll(spark, dir,
      spark.read.parquet(dir).filter(keep), partitionCol = "pt")
    ChangeLog.purge(spark, dir, keep)
    Consumers.list(spark, dir).flatMap(_.viewDir)
      .foreach(graft.runtime.MaterializedView.invalidate(spark, _))
    Scd2Store.refresh(spark, dir, store, Seq("id"), basePosition = 0L)
    assert(Scd2Store.readHistory(spark, store)
      .filter(col("id") === 4L).isEmpty,
      "the purged key's archived images must be gone")
    assert(cells(Scd2Store.readHistory(spark, store).drop("pt")) ===
      cells(rebuild(dir).drop("pt")),
      "post-purge history == rebuild over the purged log")
  }

  test("store with data but no position file fails loud") {
    val base = tmpDir("scd2store-nopos")
    val dir = s"$base/t"
    val store = s"$base/store"
    MergeUpsert.replaceAll(spark, dir, df(s0: _*), partitionCol = "pt")
    ChangeLog.recordBatch(spark, dir, Seq("id"), 1L)(
      MergeUpsert.replaceAll(spark, dir, df(s1: _*), partitionCol = "pt"))
    Scd2Store.refresh(spark, dir, store, Seq("id"), basePosition = 0L)
    val fs = new Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(store + "_pos"), false)
    ChangeLog.recordBatch(spark, dir, Seq("id"), 2L)(
      MergeUpsert.replaceAll(spark, dir, df(s2: _*), partitionCol = "pt"))
    val e = intercept[RuntimeException](
      Scd2Store.refresh(spark, dir, store, Seq("id")))
    assert(e.getMessage.contains("no position file"))
  }
}
