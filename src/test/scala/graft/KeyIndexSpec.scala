package graft

import graft.ingest.Events
import graft.runtime.{Forget, Incremental, KeyIndex, Pipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key→batch secondary index ([[graft.runtime.KeyIndex]]): the lookup
  * must equal the full-scan footprint recompute after every
  * incremental build, survive the documented crash-retry duplication,
  * erase on purge — and [[graft.runtime.Forget.forgetUserIndexed]]
  * must converge the warehouse to EXACTLY what the scan-scoped
  * forget produces, while refusing to run over a stale index. */
class KeyIndexSpec extends SparkSpec {

  private def footprint(spark: org.apache.spark.sql.SparkSession,
                        tableDir: String, key: Long): Set[(Long, Long)] =
    spark.read.parquet(tableDir)
      .filter(col("user_id") === key)
      .select(col("user_id"), col("batch_id").cast("long"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def lookupSet(indexDir: String, key: Long): Set[(Long, Long)] =
    KeyIndex.lookup(spark, indexDir, key)
      .select(col("key").cast("long"), col("batch_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental build: lookup == scan footprint across appends, " +
      "catch-up is delta-scoped, retry duplication is invisible") {
    import spark.implicits._
    val table = tmpDir("ki-table")
    val idx = KeyIndex.dirFor(table)
    def batchOf(users: Seq[Long]): DataFrame =
      users.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("event_id", "user_id")

    Incremental.appendBatch(spark, table, batchOf(Seq(1L, 2L, 2L)), 1L)
    Incremental.appendBatch(spark, table, batchOf(Seq(2L, 3L)), 2L)
    KeyIndex.ensure(spark, table, idx, "user_id")
    assert(KeyIndex.watermark(spark, idx).contains(2L))
    Seq(1L, 2L, 3L).foreach { u =>
      assert(lookupSet(idx, u) === footprint(spark, table, u),
        s"user $u footprint diverged")
    }
    assert(lookupSet(idx, 99L).isEmpty, "unknown key must answer empty")

    // A caught-up ensure is a no-op (no duplicate pairs appended).
    val before = spark.read.parquet(idx).count()
    KeyIndex.ensure(spark, table, idx, "user_id")
    assert(spark.read.parquet(idx).count() === before)

    // New batch: only the delta is indexed, lookups see it.
    Incremental.appendBatch(spark, table, batchOf(Seq(1L, 4L)), 3L)
    KeyIndex.ensure(spark, table, idx, "user_id")
    assert(KeyIndex.watermark(spark, idx).contains(3L))
    assert(lookupSet(idx, 1L) === Set((1L, 1L), (1L, 3L)))
    assert(lookupSet(idx, 4L) === Set((4L, 3L)))

    // Crash between append and watermark advance, then retry: the
    // documented window — pairs duplicate, answers must not.
    Incremental.saveWatermark(spark, s"$idx/_indexed_watermark", 2L)
    KeyIndex.ensure(spark, table, idx, "user_id")
    assert(spark.read.parquet(idx).count() > before,
      "the retry re-appends (duplication is the documented cost)")
    Seq(1L, 2L, 3L, 4L).foreach { u =>
      assert(lookupSet(idx, u) === footprint(spark, table, u),
        s"user $u diverged after retry duplication")
    }

    // Purge: the key's pairs are gone, every other key intact.
    KeyIndex.purgeKey(spark, idx, 2L)
    assert(lookupSet(idx, 2L).isEmpty, "purged key must vanish")
    Seq(1L, 3L, 4L).foreach { u =>
      assert(lookupSet(idx, u) === footprint(spark, table, u),
        s"user $u damaged by another key's purge")
    }

    // Driver-side bucket routing must equal the SQL assignment for
    // every key the index saw (one definition, two evaluators).
    val sqlBuckets = spark.read.parquet(idx)
      .select(col("key"),
        expr(KeyIndex.bucketExpr("key", KeyIndex.DefaultBuckets))
          .as("b"))
      .distinct().collect()
    sqlBuckets.foreach { r =>
      assert(KeyIndex.bucketOf(r.getLong(0),
        KeyIndex.DefaultBuckets) === r.getInt(1),
        s"bucket routing diverged for key ${r.getLong(0)}")
    }
  }

  test("forgetUserIndexed == forgetUser (warehouse-for-warehouse), " +
      "purges the index, and refuses a stale index") {
    val raw0 = Events.raw(spark, "/root/testdata/sf0.001")
    val dts = raw0.select(to_date(col("ts")).as("d")).distinct()
      .collect().map(_.getDate(0)).sortBy(_.getTime).take(4)
    val raw = raw0.filter(to_date(col("ts")) <= lit(dts.last))
      .localCheckpoint()
    val cut = dts(1)
    val u = raw.groupBy(col("user_id")).count()
      .orderBy(col("count").desc, col("user_id")).head().getLong(0)

    // Two identical warehouses from the same deterministic chain.
    def build(): (String, String) = {
      val bronze = tmpDir("kif-bronze")
      val wh = tmpDir("kif-wh")
      Incremental.appendBatch(spark, bronze,
        raw.filter(to_date(col("ts")) < lit(cut)), 1L)
      val wm = Pipeline.runDailyIncremental(spark, bronze, wh, None)
      Incremental.appendBatch(spark, bronze,
        raw.filter(to_date(col("ts")) >= lit(cut)), 2L)
      Pipeline.runDailyIncremental(spark, bronze, wh, wm)
      (bronze, wh)
    }
    val (bronzeA, whA) = build()
    val (bronzeB, whB) = build()
    val idxB = KeyIndex.dirFor(bronzeB)

    // Stale-index refusal: bronze is at watermark 2, nothing indexed.
    val stale = intercept[RuntimeException] {
      Forget.forgetUserIndexed(spark, bronzeB, whB, u)
    }
    assert(stale.getMessage.contains("STALE") &&
      stale.getMessage.contains("KeyIndex.ensure"),
      s"stale index must fail loud with the remedy: ${stale.getMessage}")

    KeyIndex.ensure(spark, bronzeB, idxB, "user_id")
    val rScan = Forget.forgetUser(spark, bronzeA, whA, u)
    val rIdx = Forget.forgetUserIndexed(spark, bronzeB, whB, u)
    assert(rScan.purged.toMap === rIdx.purged.toMap,
      s"receipts diverged: scan=${rScan.purged} idx=${rIdx.purged}")

    // Table-for-table equality of the two post-forget warehouses.
    def frame(dir: String): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p) && graft.silver.MergeUpsert.sweepAndHasData(fs, p))
        Some(spark.read.parquet(dir))
      else None
    }
    Seq("silver_sessions", "gold_user_daily", "gold_episode_daily",
      "gold_webtoon_daily", "gold_country_daily",
      "quarantine_events").foreach { t =>
      (frame(s"$whA/$t"), frame(s"$whB/$t")) match {
        case (Some(a), Some(b)) =>
          val cols = a.columns.sorted.map(col).toSeq
          val ga = a.select(cols: _*).localCheckpoint()
          val gb = b.select(cols: _*).localCheckpoint()
          assert(ga.exceptAll(gb).isEmpty && gb.exceptAll(ga).isEmpty,
            s"$t diverged between scan-forget and indexed-forget")
        case (a, b) =>
          assert(a.isEmpty === b.isEmpty,
            s"$t present in one warehouse, absent in the other")
      }
    }
    // Bronze itself: identical survivor sets.
    val ba = spark.read.parquet(bronzeA).drop("batch_id")
    val bb = spark.read.parquet(bronzeB).drop("batch_id")
    assert(ba.exceptAll(bb).isEmpty && bb.exceptAll(ba).isEmpty,
      "bronze diverged")
    assert(spark.read.parquet(bronzeB)
      .filter(col("user_id") === u).isEmpty, "user survives in bronze")

    // The index no longer remembers the forgotten user, but still
    // answers every other key exactly.
    assert(lookupSet(idxB, u).isEmpty, "index must forget the user too")
    val other = spark.read.parquet(bronzeB)
      .select(col("user_id")).distinct().limit(1)
      .collect().head.getLong(0)
    assert(lookupSet(idxB, other) === footprint(spark, bronzeB, other),
      "another user's footprint damaged by the indexed forget")

    // A second indexed forget is a receipt of zeros over the already-
    // erased world (the idempotency contract forgetUser carries).
    val again = Forget.forgetUserIndexed(spark, bronzeB, whB, u)
    assert(again.total === 0L, s"second forget purged: ${again.purged}")
  }
}
