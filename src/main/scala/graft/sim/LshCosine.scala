package graft.sim

import graft.util.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Random-hyperplane (sign) LSH for cosine ANN — the hash-bucketed
  * alternative to the [[IvfCosine]] inverted-file index (reference has no
  * ANN at all; both are north-star training-pipeline operators over the
  * embeddings table).
  *
  * [[Tables]] independent hash tables × [[BitsPerTable]] sign bits each:
  * bit (t,j) of a vector is `sign(⟨v, h_{t,j}⟩) ≥ 0` for a fixed Rademacher
  * (±1-entry) hyperplane h. Two vectors at angle θ agree on one bit with
  * p = 1 − θ/π, land in the same 8-bit bucket with p⁸, and collide in ≥1
  * of the 8 tables with 1 − (1−p⁸)⁸ — OR-amplification, the standard
  * recall/candidate-count dial. Candidates are exact-reranked with the
  * same quantized integer cosine as [[Similarity.cosineTopK]].
  *
  * Everything is integer-exact and deterministic (quantized vectors ×
  * ±1 entries, ties at dot = 0 count as bit set), so the registered
  * contract — top-k by exact cosine AMONG LSH candidates — is
  * reproducible cell-for-cell by the DuckDB oracle, which recomputes the
  * identical buckets from the same hyperplane literals
  * (OpsOracles.lshCosineTopK). Recall vs the unrestricted brute force is
  * a measured property (SimLshSpec), not part of the contract — exactly
  * how an ANN index behaves in production.
  *
  * At 100 TB: buckets become the shuffle/bucketing key; each query probes
  * [[Tables]] buckets instead of scanning the corpus, and the index build
  * is one narrow pass (64 codegen'd integer dots per vector) plus one
  * groupBy — no iteration, unlike IVF's k-means train.
  */
object LshCosine {

  val Tables = 8
  val BitsPerTable = 8
  val Dim = 64

  /** Fixed ±1 hyperplane entries from the shared LCG recipe (seed 7):
    * the (t)(j) entry is the 64-long Rademacher vector of bit j of table
    * t. Any (tables, bits) shape draws a deterministic prefix of the same
    * LCG stream, so every consumer (Scala plan, ScalaTest, DuckDB oracle)
    * can regenerate the identical family from the two literals. */
  def signsFor(tables: Int, bits: Int): IndexedSeq[IndexedSeq[Array[Long]]] = {
    var state = 7L
    def next(): Long = {
      state = (state * 6364136223846793005L + 1442695040888963407L)
      state >>> 33
    }
    IndexedSeq.tabulate(tables, bits) { (_, _) =>
      Array.fill(Dim)(if ((next() & 1L) == 0L) 1L else -1L)
    }
  }

  /** The 8×8 family the ANN index ([[topK]]) is built on. */
  val signs: IndexedSeq[IndexedSeq[Array[Long]]] =
    signsFor(Tables, BitsPerTable)

  /** (vec_id, tbl, bucket): bucket = packed sign bits of the quantized
    * vector against table `tbl`'s hyperplanes. r18 shape (guide §2.4):
    * all `tables` buckets are packed IN-ROW — one nested
    * transform/aggregate expression over the hyperplane family as a
    * tables×bits×Dim literal, then a narrow posexplode to the (vec_id,
    * tbl, bucket) grain. The former shape inline-exploded tables×bits
    * rows per vector and re-grouped them with a (vec_id, tbl) hash
    * aggregate — a full exchange of rows·tables·bits whose only purpose
    * was to re-associate bits the expression already had in one row.
    * Bit/packing arithmetic is verbatim (int shiftleft(1, bit) cast to
    * bigint, dot ≥ 0 counts as set), so buckets are bit-identical. */
  def bucketsFor(quantized: DataFrame, tables: Int, bits: Int): DataFrame = {
    val planes = typedLit(signsFor(tables, bits).map(_.map(_.toSeq)))
    val buckets = transform(planes, t =>
      aggregate(
        transform(t, (h, j) =>
          when(call_function("graft_dot", col("q"), h) >= 0,
            call_function("shiftleft", lit(1), j).cast("long"))
            .otherwise(0L)),
        lit(0L), (acc, x) => acc + x))
    quantized.select(col("vec_id"),
        posexplode_outer(buckets).as(Seq("tbl", "bucket")))
      .filter(col("tbl").isNotNull)
  }

  /** [[bucketsFor]] with the ANN index's 8×8 family. */
  def buckets(quantized: DataFrame): DataFrame =
    bucketsFor(quantized, Tables, BitsPerTable)

  /** (bits, tables) for a cosine-threshold candidate join with per-pair
    * miss probability ≤ delta AT the threshold.
    *
    * Sign-LSH bit-agreement probability for a pair at cosine τ is
    * p = 1 − acos(τ)/π (Goemans–Williamson); a b-bit bucket collides with
    * p^b and T independent tables miss with (1 − p^b)^T ≤ exp(−T·p^b).
    * We take the largest b whose required T = ln(1/δ)/p^b still fits
    * maxTables — more bits per table is strictly cheaper in candidates
    * (factor (2p)^−b per random pair) for the same recall.
    *
    * Honest scale note: selectivity vs a random pair (p₀ = ½) is
    * T·2^−b. At real near-dup thresholds (τ ≥ 0.7 → b ≥ 6, T ≈ 54)
    * that is ≤ 0.85 and falls fast with τ; at τ = 0.4 the gap between
    * p = 0.63 and p₀ = 0.5 is so small (LSH exponent ρ ≈ 0.66) that ANY
    * complete candidate family costs ~all pairs — an information-theoretic
    * floor of the regime (Indyk–Motwani), not a property of this plan.
    * The plan shape stays an equi-join either way; no cross join. */
  def deriveParams(threshold: Double, delta: Double = 1e-4,
                   maxTables: Int = 64): (Int, Int) = {
    require(threshold > 0 && threshold < 1, "threshold in (0,1)")
    val p = 1.0 - math.acos(threshold) / math.Pi
    val lnInvDelta = math.log(1.0 / delta)
    var b = 2
    // Cap at 31: bucketsFor packs bits with int shiftleft(1, bit), whose
    // shift count wraps mod 32 — past 31 the extra bits would silently
    // ALIAS onto low bits (recall survives, the designed 2^-b selectivity
    // does not). τ ≥ ~0.984 hits the cap; the table count compensates.
    while (b < 31 && lnInvDelta / math.pow(p, b + 1) <= maxTables) b += 1
    (b, math.ceil(lnInvDelta / math.pow(p, b)).toInt)
  }

  /** Registered query: top-k by exact quantized cosine among vectors
    * sharing ≥1 LSH bucket with the query (queries = vec_id < nQueries,
    * query itself excluded). Rounding and tie-breaks identical to
    * [[Similarity.cosineTopK]]; a query whose candidate set has fewer
    * than k members returns fewer rows. */
  def topK(s: SparkSession, dir: String, nQueries: Int = 10,
           k: Int = 5): DataFrame =
    topKFrom(Similarity.quantizedNonZero(s, dir), nQueries, k)

  /** [[topK]] over an already-quantized (vec_id, q, n) frame. The frame
    * is deliberately NOT cached: it is read three times (index build,
    * query side, rerank side), but each read is a narrow codegen'd
    * transform over the scan — at corpus scale you would not pin the
    * corpus in storage memory, and in long-lived sessions an in-method
    * persist would leak past return. */
  def topKFrom(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val quant = emb
    val idx = buckets(quant)
    val qb = idx.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("tbl"), col("bucket"))
    // Probe: query buckets × index — the per-table bucket equi-join IS
    // the candidate generation; distinct collapses multi-table hits.
    val cands = qb.join(idx.withColumnRenamed("vec_id", "neighbor_id"),
        Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val q = quant.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("n").as("qn"))
    val c = quant.select(col("vec_id").as("neighbor_id"),
      col("q").as("cv"), col("n").as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cands
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("neighbor_id"))
      .withColumn("dot", expr("graft_dot(qv, cv)"))
      .withColumn("cosine",
        Num.r(col("dot").cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double"))),
          6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
