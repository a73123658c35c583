package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval-overlap join — the range-join class the engine's as-of
  * (point→latest) and band (point±window) joins don't cover: both sides
  * carry [start, end] INTERVALS and the predicate is overlap. The naive
  * plan is a cartesian with an inequality filter — the classic
  * O(n²) range-join trap; the scale shape here is TIME-BUCKET
  * EQUI-JOIN: each interval explodes to the fixed-width buckets it
  * spans, candidates meet on bucket equality (never a cross product),
  * the exact overlap predicate filters, and pairs that share several
  * buckets dedupe before counting. Completeness: an overlapping pair
  * shares every bucket containing an overlap point, so bucket equality
  * never misses a true pair. Fan-out is span/bucketWidth per interval —
  * session-length bounded, not corpus-scaled — and per-bucket work is
  * quadratic only in the CONCURRENCY of that hour, the quantity the
  * query measures.
  *
  * Registered form: per-session concurrency — for each session's
  * [min start, max end] envelope, how many OTHER sessions' envelopes
  * overlap it (any user) — the load/concurrency lens a capacity
  * planner reads. */
object IntervalJoin {

  /** Bucket width: one hour of epoch-µs. */
  val BucketUs = 3600000000L

  def concurrentSessions(spark: SparkSession, dir: String): DataFrame = {
    // Gold-side convention: sessions over cleansed events (the silver
    // dedup is its own materialization — the goldPre oracle preamble).
    val sess = graft.silver.Sessionize
      .sessions(graft.ingest.Events.cleansed(spark, dir))
      .groupBy(col("session_id"))
      .agg(min(col("start_us")).as("s"), max(col("end_us")).as("e"))
      .persist()
    // explode_outer + null filter: the bucket list is a DERIVED array
    // (the InferFiltersFromGenerate pitfall PlanSpec guards).
    val buckets = sess.select(col("session_id"), col("s"), col("e"),
      explode_outer(expr(s"sequence(s div ${BucketUs}L, e div ${BucketUs}L)"))
        .as("bkt"))
      .filter(col("bkt").isNotNull)
    val pairs = buckets.as("a")
      .join(buckets.as("b"),
        col("a.bkt") === col("b.bkt") &&
          col("a.session_id") =!= col("b.session_id") &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.session_id").as("session_id"),
        col("b.session_id").as("other_id"))
      .distinct()
    val counts = pairs.groupBy(col("session_id"))
      .agg(count(lit(1)).as("n_concurrent"))
    sess.join(counts, Seq("session_id"), "left")
      .select(col("session_id"), col("s").as("start_us"),
        col("e").as("end_us"),
        coalesce(col("n_concurrent"), lit(0L)).as("n_concurrent"))
  }
}
