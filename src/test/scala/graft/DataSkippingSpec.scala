package graft

import graft.runtime.DataSkipping
import org.apache.spark.sql.functions._

/** File-level data skipping ([[graft.runtime.DataSkipping]]): pruning
  * must be EXACT (pruned scan == full-table filter, boundary files
  * and nulls included), actually PRUNE (surviving < total on a narrow
  * range over a clustered layout), and fail LOUD on a stale sidecar —
  * a partial scan that looks complete is the one unacceptable mode. */
class DataSkippingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshOrdersLayout(): String = {
    val dir = tmpDir("skip-orders")
    DataSkipping.cluster(spark,
      spark.read.parquet(s"$sf/orders.parquet"), dir,
      Seq("o_orderdate"), numFiles = 8)
    dir
  }

  test("pruned range scan equals the full-table filter, and prunes") {
    val dir = freshOrdersLayout()
    val lo = lit("1996-07-01").cast("timestamp")
    val hi = lit("1996-09-30").cast("timestamp")
    val (surviving, total) = DataSkipping.pruneFiles(spark, dir,
      "o_orderdate", Some(lo), Some(hi))
    assert(total === 8, "cluster must have produced the asked file count")
    assert(surviving.nonEmpty && surviving.size < total,
      s"a ~3-month range over a ~6-year clustered span must prune: " +
        s"${surviving.size} of $total survived")

    val got = DataSkipping.scan(spark, dir, "o_orderdate", lo, hi)
    val exp = spark.read.parquet(dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") <= hi)
    assert(got.count() === exp.count())
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
      "pruned scan diverged from the full filter")
  }

  test("empty intersection reads nothing and keeps the schema; " +
      "point lookup works") {
    val dir = freshOrdersLayout()
    val none = DataSkipping.scan(spark, dir, "o_orderdate",
      lit("1894-01-01").cast("timestamp"),
      lit("1894-12-31").cast("timestamp"))
    assert(none.isEmpty)
    assert(none.columns.toSet ===
      spark.read.parquet(dir).columns.toSet)
    val (survived0, _) = DataSkipping.pruneFiles(spark, dir,
      "o_orderdate",
      Some(lit("1894-01-01").cast("timestamp")),
      Some(lit("1894-12-31").cast("timestamp")))
    assert(survived0.isEmpty, "out-of-envelope range must prune ALL files")

    // Point lookup (lo == hi): one day, at most a couple of files.
    val d = lit("1996-07-04").cast("timestamp")
    val got = DataSkipping.scan(spark, dir, "o_orderdate", d, d)
    val exp = spark.read.parquet(dir).filter(col("o_orderdate") === d)
    assert(got.count() === exp.count())
  }

  test("a stale sidecar fails loud, and a rebuild heals it") {
    val dir = freshOrdersLayout()
    // An out-of-band writer appends a file the zone map never saw.
    spark.read.parquet(s"$sf/orders.parquet").limit(5)
      .coalesce(1).write.mode("append").parquet(dir)
    val e = intercept[RuntimeException] {
      DataSkipping.scan(spark, dir, "o_orderdate",
        lit("1996-07-01").cast("timestamp"),
        lit("1996-09-30").cast("timestamp"))
    }
    assert(e.getMessage.contains("STALE") &&
      e.getMessage.contains("buildStats"),
      s"staleness must name itself and the remedy: ${e.getMessage}")

    DataSkipping.buildStats(spark, dir, Seq("o_orderdate"))
    val got = DataSkipping.scan(spark, dir, "o_orderdate",
      lit("1996-07-01").cast("timestamp"),
      lit("1996-09-30").cast("timestamp"))
    val exp = spark.read.parquet(dir).filter(
      col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") <= lit("1996-09-30").cast("timestamp"))
    assert(got.count() === exp.count(), "rebuilt sidecar must serve again")
  }

  test("null values never match a range and an all-null file prunes; " +
      "an unindexed column fails loud") {
    import spark.implicits._
    val dir = tmpDir("skip-nulls")
    // Three value regions + one ALL-NULL region, clustered so the null
    // region lands in its own file (nulls sort first in range exchange).
    val df = ((1 to 40).map(i => (i.toLong, Some(i.toLong))) ++
      (1 to 10).map(i => (100L + i, Option.empty[Long])))
      .toDF("id", "v")
    DataSkipping.cluster(spark, df, dir, Seq("v"), numFiles = 4)

    val got = DataSkipping.scan(spark, dir, "v", lit(10L), lit(20L))
    assert(got.count() === 11L)
    assert(got.filter(col("v").isNull).isEmpty,
      "a range predicate must never return NULL rows")

    val e = intercept[RuntimeException] {
      DataSkipping.scan(spark, dir, "id", lit(1L), lit(2L))
    }
    assert(e.getMessage.contains("does not index"),
      s"unindexed column must fail loud: ${e.getMessage}")
  }

  test("statsCols beyond the cluster key: a Z-value layout gives BOTH " +
      "dimensions file-bounded envelopes") {
    import spark.implicits._
    val dir = tmpDir("skip-z")
    // Two independent dimensions, bit-interleaved (the EventOps
    // zorderKey scheme at toy width): clustering on z bounds u AND h
    // per file, so a range on EITHER prunes.
    val df = (0 until 1024).map { i =>
      val u = i % 32; val h = i / 32
      val z = (0 until 5).map { b =>
        (((u >> b) & 1) << (2 * b)) | (((h >> b) & 1) << (2 * b + 1))
      }.sum
      (u.toLong, h.toLong, z.toLong)
    }.toDF("u", "h", "z")
    DataSkipping.cluster(spark, df, dir, Seq("z"), numFiles = 16,
      statsCols = Seq("u", "h"))

    Seq("u", "h").foreach { c =>
      val (surviving, total) = DataSkipping.pruneFiles(spark, dir, c,
        Some(lit(0L)), Some(lit(7L)))
      assert(surviving.size < total,
        s"a narrow range on '$c' must prune under the Z layout: " +
          s"${surviving.size} of $total")
      val got = DataSkipping.scan(spark, dir, c, lit(0L), lit(7L))
      assert(got.count() === 8L * 32L)
    }
  }

  test("append maintains the sidecar incrementally: old rows carry " +
      "over byte-identical, pruning stays exact over the mixed " +
      "layout, and recluster re-tightens it") {
    val dir = freshOrdersLayout()
    val zmBefore = spark.read.parquet(s"$dir/_zonemap")
      .collect().map(_.toString).toSet

    // Append an unclustered delta (a wide-envelope tail file).
    val delta = spark.read.parquet(s"$sf/orders.parquet").limit(500)
    DataSkipping.append(spark, delta.coalesce(1), dir,
      Seq("o_orderdate"))
    val zmAfter = spark.read.parquet(s"$dir/_zonemap")
    assert(zmAfter.count() === 9, "8 clustered files + 1 appended")
    assert(zmBefore.subsetOf(
      zmAfter.collect().map(_.toString).toSet),
      "covered files' stats rows must carry over untouched")

    // Pruning over the mixed layout: still EXACT (the tail file
    // survives every in-envelope range — weaker, never wrong).
    val lo = lit("1996-07-01").cast("timestamp")
    val hi = lit("1996-09-30").cast("timestamp")
    val got = DataSkipping.scan(spark, dir, "o_orderdate", lo, hi)
    // Materialized: the recluster below replaces the files this lazy
    // plan would otherwise re-list.
    val exp = spark.read.parquet(dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") <= hi)
      .localCheckpoint()
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
      "mixed-layout pruned scan diverged")
    val (mixedSurvive, mixedTotal) = DataSkipping.pruneFiles(spark,
      dir, "o_orderdate", Some(lo), Some(hi))
    assert(mixedTotal === 9)

    // Recluster: full re-layout, fresh sidecar, tighter than mixed.
    DataSkipping.recluster(spark, dir, Seq("o_orderdate"),
      numFiles = 8)
    val (tight, total) = DataSkipping.pruneFiles(spark, dir,
      "o_orderdate", Some(lo), Some(hi))
    assert(total === 8)
    assert(tight.size < mixedSurvive.size,
      s"recluster must re-tighten: $tight vs mixed $mixedSurvive")
    val got2 = DataSkipping.scan(spark, dir, "o_orderdate", lo, hi)
    assert(got2.exceptAll(exp).isEmpty && exp.exceptAll(got2).isEmpty,
      "post-recluster scan diverged (delta rows included)")
    assert(got2.count() === exp.count())

    // ensureStats is an idempotent no-op on a reconciled directory.
    val snap = spark.read.parquet(s"$dir/_zonemap")
      .collect().map(_.toString).toSet
    DataSkipping.ensureStats(spark, dir, Seq("o_orderdate"))
    assert(spark.read.parquet(s"$dir/_zonemap")
      .collect().map(_.toString).toSet === snap)
  }

  test("recluster recovery: a crash between the swap renames restores " +
      "the complete old table on the next call") {
    val dir = freshOrdersLayout()
    val expect = spark.read.parquet(dir).count()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Simulate the window: live renamed to backup, new layout never
    // landed.
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(s"$dir.recluster-backup")))
    DataSkipping.recluster(spark, dir, Seq("o_orderdate"), numFiles = 4)
    assert(spark.read.parquet(dir).count() === expect)
    val (_, total) = DataSkipping.pruneFiles(spark, dir, "o_orderdate",
      Some(lit("1996-07-01").cast("timestamp")),
      Some(lit("1996-09-30").cast("timestamp")))
    assert(total === 4, "recovered table re-clustered to the new layout")
  }
}
