package graft

import graft.runtime.ResultCache
import graft.silver.MergeUpsert
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Result cache ([[graft.runtime.ResultCache]]): hit/miss discipline
  * against the inputs' listing signature — a hit never forces the
  * compute thunk and scans ONLY the cache directory; any committed
  * input mutation (append, and crucially a REWRITE under an unchanged
  * watermark — the forget/compaction shape a watermark key would
  * miss) invalidates; a version bump invalidates without any input
  * change; and every crash window (missing signature, missing data)
  * converges to a recompute, never a stale serve. */
class ResultCacheSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType),
    StructField("batch_id", LongType)))

  private def df(rows: (Long, Long, Long)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3)), 2), schema)

  private def cells(d: DataFrame): Seq[Seq[String]] = {
    val cols = d.columns.sorted
    d.select(cols.map(col): _*).collect()
      .map(r => cols.indices.map(i => String.valueOf(r.get(i))).toSeq)
      .toSeq.sortBy(_.mkString("|"))
  }

  test("hit serves without forcing compute and scans only the cache; " +
      "append, rewrite-in-place and version bump all invalidate") {
    val base = tmpDir("rcache")
    val input = s"$base/input"
    val root = s"$base/cache"
    df((1L, 10L, 1L), (2L, 20L, 1L), (3L, 30L, 2L))
      .write.partitionBy("batch_id").parquet(input)

    var computes = 0
    def compute(): DataFrame = {
      computes += 1
      spark.read.parquet(input).groupBy(col("batch_id"))
        .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
    }
    def serve() = ResultCache.serve(spark, root, "agg", Seq(input))(
      compute())

    val first = serve()
    assert(computes === 1)
    val expect1 = cells(compute()); computes -= 1 // reference, not a serve
    assert(cells(first) === expect1)

    // Hit: thunk not forced, result identical, plan reads the cache
    // directory and nothing under the input.
    val second = serve()
    assert(computes === 1, "hit must not force the compute thunk")
    assert(cells(second) === expect1)
    val scanned = second.queryExecution.executedPlan.toString
    assert(scanned.contains("cache"), "hit plan should scan the cache")
    assert(!scanned.contains("input"),
      s"hit plan must not touch the input: $scanned")
    assert(ResultCache.isCurrent(spark, root, "agg", Seq(input)))

    // Append a batch: signature moves, serve recomputes.
    df((4L, 40L, 3L)).write.partitionBy("batch_id")
      .mode("append").parquet(input)
    assert(!ResultCache.isCurrent(spark, root, "agg", Seq(input)))
    val third = serve()
    assert(computes === 2, "append must invalidate")
    assert(cells(third) === cells(compute())); computes -= 1

    // Rewrite IN PLACE under the same partition set and row count —
    // the forget/compaction shape: watermark unchanged, content
    // changed. The listing (fresh part-file names, mtime) catches it.
    MergeUpsert.replacePartitions(spark, input,
      df((1L, 11L, 1L), (2L, 20L, 1L)), Seq(1L),
      partitionCol = "batch_id")
    assert(!ResultCache.isCurrent(spark, root, "agg", Seq(input)),
      "an in-place rewrite must invalidate even at an unchanged " +
        "watermark")
    val fourth = serve()
    assert(computes === 3)
    assert(cells(fourth) === cells(compute())); computes -= 1

    // Version bump: same inputs, new query identity — must miss.
    ResultCache.serve(spark, root, "agg", Seq(input), "v2")(compute())
    assert(computes === 4, "a version bump must invalidate")
  }

  test("crash windows converge, never serve stale: a torn _sig costs " +
      "NOTHING (the dir name commits to the signature), lost data " +
      "recomputes") {
    val base = tmpDir("rcache-crash")
    val input = s"$base/input"
    val root = s"$base/cache"
    df((1L, 10L, 1L)).write.partitionBy("batch_id").parquet(input)
    var computes = 0
    def serve() = ResultCache.serve(spark, root, "q", Seq(input)) {
      computes += 1
      spark.read.parquet(input).agg(sum(col("v")).as("s"))
    }
    serve(); assert(computes === 1)

    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Crash after data swap, before signature commit: `_sig` missing.
    // The materialization dir's NAME commits to the signature, so the
    // next serve HITS — the crash costs nothing, and a stale serve is
    // unrepresentable (wrong inputs → different dir name).
    fs.delete(new Path(s"$root/q/_sig"), false)
    serve(); assert(computes === 1,
      "a torn _sig must not force a recompute")

    // Manual data loss: every materialization gone → recompute.
    fs.listStatus(new Path(s"$root/q"))
      .filter(_.getPath.getName.startsWith("data-"))
      .foreach(st => fs.delete(st.getPath, true))
    serve(); assert(computes === 2, "missing data => recompute")

    // Invalidate drops the entry wholesale.
    ResultCache.invalidate(spark, root, "q")
    serve(); assert(computes === 3)
  }

  test("keepSignatures bounds retained materializations LRU; " +
      "oscillating inputs re-hit their retained old materialization") {
    val base = tmpDir("rcache-evict")
    val input = s"$base/input"
    val root = s"$base/cache"
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def write(rows: (Long, Long, Long)*): Unit = {
      fs.delete(new Path(input), true)
      df(rows: _*).write.partitionBy("batch_id").parquet(input)
    }
    var computes = 0
    def serve() = ResultCache.serve(spark, root, "q", Seq(input)) {
      computes += 1
      spark.read.parquet(input).agg(sum(col("v")).as("s"))
    }
    def nDirs: Int = fs.listStatus(new Path(s"$root/q"))
      .count(_.getPath.getName.startsWith("data-"))

    // State A, then state B: both retained (keepSignatures = 2) — so
    // a query whose input POINTER flips back to A (the A/B-table-swap
    // shape; the physical listing returns unchanged) re-hits A's
    // materialization without a recompute.
    val inputB = s"$base/inputB"
    df((9L, 90L, 1L)).write.partitionBy("batch_id").parquet(inputB)
    def serveOn(dirs: Seq[String]) =
      ResultCache.serve(spark, root, "q", dirs) {
        computes += 1
        spark.read.parquet(dirs.head).agg(sum(col("v")).as("s"))
      }
    write((1L, 10L, 1L))
    serveOn(Seq(input)); assert(computes === 1)
    serveOn(Seq(inputB)); assert(computes === 2)
    assert(nDirs === 2, "both signatures must be retained")
    serveOn(Seq(input))
    assert(computes === 2,
      "flipping back to a retained input state must re-HIT")
    // A THIRD signature evicts the least-recently-served (inputB's).
    write((2L, 20L, 1L))
    serve(); assert(computes === 3)
    assert(nDirs === 2,
      "serving a third signature must evict the least-recently-served")

    // keepSignatures = 1 keeps only the current one.
    write((3L, 30L, 1L))
    ResultCache.serve(spark, root, "q", Seq(input),
      keepSignatures = 1) {
      computes += 1
      spark.read.parquet(input).agg(sum(col("v")).as("s"))
    }
    assert(computes === 4)
    assert(nDirs === 1, "keepSignatures = 1 must retain only current")
  }

  test("LRU ordering reads the _served body epoch, not the file " +
      "mtime: equal mtimes still evict the content-older entry") {
    val base = tmpDir("rcache-body")
    val input = s"$base/input"
    val root = s"$base/cache"
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def write(rows: (Long, Long, Long)*): Unit = {
      fs.delete(new Path(input), true)
      df(rows: _*).write.partitionBy("batch_id").parquet(input)
    }
    def serve(): Unit = {
      ResultCache.serve(spark, root, "q", Seq(input)) {
        spark.read.parquet(input).agg(sum(col("v")).as("s"))
      }
      ()
    }
    def dirs: Set[String] = fs.listStatus(new Path(s"$root/q"))
      .map(_.getPath.getName).filter(_.startsWith("data-")).toSet

    write((1L, 10L, 1L)); serve()
    val dirA = dirs.head
    write((2L, 20L, 1L)); serve()
    val dirB = (dirs - dirA).head
    // Rewrite both stamps: A claims the NEWER epoch in its body, B the
    // older — then pin both files to the SAME mtime. An mtime-ordered
    // eviction would tie-break arbitrarily; the content order must
    // keep A and evict B.
    def stamp(dir: String, epoch: Long): Unit = {
      val p = new Path(s"$root/q/$dir/_served")
      val out = fs.create(p, true)
      try out.write(epoch.toString.getBytes("UTF-8")) finally out.close()
      fs.setTimes(p, 1700000000000L, 1700000000000L)
    }
    stamp(dirA, 2000L)
    stamp(dirB, 1000L)
    write((3L, 30L, 1L)); serve() // third signature → evict one
    val after = dirs
    assert(after.contains(dirA),
      "the entry whose _served BODY is newer must survive")
    assert(!after.contains(dirB),
      "the entry whose _served BODY is older must evict, regardless " +
        "of equal file mtimes")
  }
}
