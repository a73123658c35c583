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

  test("partitioned warehouse table: the WRITERS keep per-leaf zone " +
      "maps fresh — upsert, partition replace/drop and compaction all " +
      "serve scanPartitioned with NO manual rebuild; a bypassing " +
      "writer fails loud and maintain heals it") {
    import graft.silver.MergeUpsert
    val dir = tmpDir("skip-part") + "/orders"
    val base = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .localCheckpoint()
    // Writer-shaped stage: range layout on (partition, stats col) so
    // every leaf gets in-partition clustered files.
    def shaped(df: org.apache.spark.sql.DataFrame) =
      df.repartitionByRange(12, col("o_month"), col("o_custkey"))
        .sortWithinPartitions(col("o_month"), col("o_custkey"))
    MergeUpsert.replaceAll(spark, dir, shaped(base),
      partitionCol = "o_month")
    DataSkipping.enablePartitioned(spark, dir, Seq("o_custkey"))

    val maxCust = base.agg(max(col("o_custkey"))).head().getLong(0)
    val lo = lit(0L); val hi = lit(maxCust / 8)
    def served = DataSkipping.scanPartitioned(spark, dir,
      "o_custkey", lo, hi)
    def expect = spark.read.parquet(dir)
      .filter(col("o_custkey") >= lo && col("o_custkey") <= hi)
    def assertServes(what: String): Unit = {
      val g = served.localCheckpoint(); val e = expect.localCheckpoint()
      assert(g.exceptAll(e).isEmpty && e.exceptAll(g).isEmpty &&
        g.count() === e.count(), s"$what diverged")
    }
    assertServes("initial enable")
    // And it actually PRUNES within partitions: the narrow custkey
    // range must survive in strictly fewer files than the table holds.
    val allFiles = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    val readFiles = served
      .select(input_file_name()).distinct().count()
    assert(readFiles < allFiles,
      s"within-partition file pruning must engage: $readFiles of $allFiles")

    // (a) Keyed upsert into two months — the writer reconciles the
    // rewritten leaves; no manual rebuild.
    val touched = base.filter(col("o_month").isin("1996-02", "1996-05"))
      .limit(40).withColumn("o_totalprice", col("o_totalprice") + 1.0)
    MergeUpsert.upsert(spark, dir, shaped(touched), Seq("o_orderkey"),
      partitionCol = "o_month")
    assertServes("after upsert")

    // (b) replacePartitions (the Retention/IncrementalGold rewrite
    // shape): one month recomputed, one month dropped empty.
    MergeUpsert.replacePartitions(spark, dir,
      shaped(base.filter(col("o_month") === "1996-03")),
      Seq("1996-03", "1996-06"), partitionCol = "o_month")
    assert(spark.read.parquet(dir)
      .filter(col("o_month") === "1996-06").isEmpty,
      "fixture: the June leaf must be dropped")
    assertServes("after partition replace + drop")

    // (c) Compaction: rewritten leaves reconcile inside compact().
    val report = graft.runtime.Compaction.compact(spark, dir)
    assert(report.count() > 0, "fixture: compaction must rewrite leaves")
    assertServes("after compaction")

    // (d) A writer that bypasses the maintained path leaves the leaf's
    // map stale: the scan fails LOUD (names the remedy), and a
    // maintain pass heals exactly that leaf.
    base.filter(col("o_month") === "1996-01").limit(5)
      .coalesce(1).write.mode("append").parquet(s"$dir/o_month=1996-01")
    val e = intercept[RuntimeException] { served.count() }
    assert(e.getMessage.contains("STALE"),
      s"bypassed write must fail loud: ${e.getMessage}")
    DataSkipping.maintain(spark, dir, Seq("o_month=1996-01"))
    assertServes("after heal")

    // (e) The partition cut composes: restricting leaves by name reads
    // a strict subset and stays exact within it.
    val gotQ1 = DataSkipping.scanPartitioned(spark, dir, "o_custkey",
      lo, hi, partitionKeep = _ <= "o_month=1996-03")
    val expQ1 = expect.filter(col("o_month") <= "1996-03")
    assert(gotQ1.exceptAll(expQ1).isEmpty &&
      expQ1.exceptAll(gotQ1).isEmpty, "partition-cut scan diverged")

    // (f) Flat-form guards: the flat entry points refuse the
    // partitioned table instead of serving a silently partial answer.
    Seq(
      () => DataSkipping.ensureStats(spark, dir, Seq("o_custkey")),
      () => DataSkipping.pruneFiles(spark, dir, "o_custkey",
        Some(lo), Some(hi)),
      () => DataSkipping.buildStats(spark, dir, Seq("o_custkey"))
    ).foreach { f =>
      val g = intercept[RuntimeException] { f() }
      assert(g.getMessage.contains("hive-partitioned"),
        s"flat entry point must refuse a partitioned dir: ${g.getMessage}")
    }

    // (g) Per-leaf recluster: the bypassed-then-healed January leaf
    // carries an unshaped wide-envelope file; re-tightening JUST that
    // leaf goes through the standard writer (zone map reconciled, no
    // manual rebuild), leaves every other leaf untouched, and the
    // scan stays exact.
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val otherLeaf = new org.apache.hadoop.fs.Path(s"$dir/o_month=1996-02")
    val otherMt = fs.getFileStatus(otherLeaf).getModificationTime
    DataSkipping.reclusterPartition(spark, dir, "o_month=1996-01",
      numFiles = 4)
    assertServes("after per-leaf recluster")
    assert(fs.getFileStatus(otherLeaf).getModificationTime === otherMt,
      "a per-leaf recluster must not touch other leaves")
    val janFiles = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$dir/o_month=1996-01"))
      .map(_.getPath.getName)
      .count(n => !n.startsWith(".") && !n.startsWith("_"))
    assert(janFiles === 4,
      s"the leaf must carry exactly the asked file count, got $janFiles")
    // Guards: a missing leaf and a non-leaf name fail loud.
    assert(intercept[RuntimeException] {
      DataSkipping.reclusterPartition(spark, dir, "o_month=2099-01", 2)
    }.getMessage.contains("no such partition"))
    assert(intercept[IllegalArgumentException] {
      DataSkipping.reclusterPartition(spark, dir, "noleaf", 2)
    }.getMessage.contains("hive leaf"))
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
