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
    * signs(t)(j) is the 64-long Rademacher vector of bit j of table t. */
  val signs: IndexedSeq[IndexedSeq[Array[Long]]] = {
    var state = 7L
    def next(): Long = {
      state = (state * 6364136223846793005L + 1442695040888963407L)
      state >>> 33
    }
    IndexedSeq.tabulate(Tables, BitsPerTable) { (_, _) =>
      Array.fill(Dim)(if ((next() & 1L) == 0L) 1L else -1L)
    }
  }

  /** (tbl, bit, s) hyperplane frame — Tables×BitsPerTable rows, tiny. */
  private def hyperplanes(s: SparkSession): DataFrame = {
    import s.implicits._
    (for {
      t <- 0 until Tables
      j <- 0 until BitsPerTable
    } yield (t, j, signs(t)(j).toSeq)).toDF("tbl", "bit", "s")
  }

  /** (vec_id, tbl, bucket): bucket = packed sign bits of the quantized
    * vector against table `tbl`'s hyperplanes. One broadcast cross join
    * (64 rows) + one narrow groupBy per vector — the index build. */
  def buckets(quantized: DataFrame): DataFrame =
    quantized.select("vec_id", "q")
      .crossJoin(broadcast(hyperplanes(quantized.sparkSession)))
      .withColumn("dot", expr("graft_dot(q, s)"))
      .groupBy(col("vec_id"), col("tbl"))
      .agg(sum(when(col("dot") >= 0,
        expr("cast(shiftleft(1, bit) as bigint)")).otherwise(0L))
        .as("bucket"))

  /** Registered query: top-k by exact quantized cosine among vectors
    * sharing ≥1 LSH bucket with the query (queries = vec_id < nQueries,
    * query itself excluded). Rounding and tie-breaks identical to
    * [[Similarity.cosineTopK]]; a query whose candidate set has fewer
    * than k members returns fewer rows. */
  def topK(s: SparkSession, dir: String, nQueries: Int = 10,
           k: Int = 5): DataFrame =
    topKFrom(Similarity.quantized(s, dir), nQueries, k)

  /** [[topK]] over an already-quantized (vec_id, q, n) frame. */
  def topKFrom(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val quant = emb.persist()
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
