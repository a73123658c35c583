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

  test("crash windows converge to a recompute, never a stale serve") {
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
    // Crash after data swap, before signature commit: sig missing.
    fs.delete(new Path(s"$root/q/_sig"), false)
    serve(); assert(computes === 2, "missing signature => recompute")

    // Crash after signature retire... then a later manual data loss:
    // sig present, data missing.
    fs.delete(new Path(s"$root/q/data"), true)
    serve(); assert(computes === 3, "missing data => recompute")

    // Invalidate drops the entry wholesale.
    ResultCache.invalidate(spark, root, "q")
    serve(); assert(computes === 4)
  }
}
