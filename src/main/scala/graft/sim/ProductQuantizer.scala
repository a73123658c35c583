package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN — the memory-bound embedding index for
  * corpora whose raw vectors don't fit storage: each vector is encoded as
  * [[M]] sub-codes (one byte-ish code per [[SubDim]]-dim subspace), and
  * queries score candidates with asymmetric distance computation (ADC):
  * a per-query table of exact query→centroid distances per subspace,
  * summed over the candidate's codes. 64-dim float vectors become
  * [[M]] codes (8 bytes) — a 32× compression — and scoring touches only
  * the code table, never the raw vectors (Jégou et al., TPAMI 2011).
  *
  * Deterministic and integer-exact end-to-end, so the DuckDB oracle
  * replays it cell-for-cell: micro-unit quantization first, codebooks
  * seeded from the first [[K]] vectors' sub-slices, one integer-mean
  * Lloyd refinement per subspace (the [[KMeans]] recipe, keyed by
  * subspace), and ALL distances are integer squared-L2 — no division,
  * no sqrt, no doubles anywhere.
  *
  * Plan shape at scale: codebooks are M·K·SubDim longs (tiny, broadcast);
  * encoding is one narrow pass over the corpus (M·K integer dots per
  * vector, argmin per subspace); ADC is a broadcast equi-join of the
  * per-query distance tables against the code table on (subspace, code)
  * followed by a fixed fan-in (M rows per candidate) sum — no shuffle
  * grows with corpus size except the final per-query top-k. */
object ProductQuantizer {

  val M = 8       // subspaces
  val SubDim = 8  // dims per subspace (M * SubDim = 64)
  val K = 16      // centroids per subspace

  /** (vec_id, s, sv): the quantized vector split into M subspace slices.
    * posexplode_outer + pos-null filter per the repo-wide generate rule. */
  private[sim] def subVectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode_outer(expr(
        s"transform(sequence(0, ${M - 1}), " +
          s"s -> slice(q, s * $SubDim + 1, $SubDim))"))
        .as(Seq("s", "sv")))
      .filter(col("s").isNotNull)

  /** Integer squared-L2 between two SubDim slices via dot products:
    * |x−c|² = x·x − 2x·c + c·c (all exact longs). */
  private[sim] def dist2(svn: String, cvn: String, dotc: String) =
    col(svn) - lit(2L) * col(dotc) + col(cvn)

  /** Nearest-code assignment of sub-vectors against a (s, code, cv, cvn)
    * codebook; ties break to the lowest code. */
  private[sim] def assign(sub: DataFrame, books: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("s"))
      .orderBy(col("d2").asc, col("code").asc)
    sub.join(broadcast(books), Seq("s"))
      .withColumn("dot", expr("graft_dot(sv, cv)"))
      .withColumn("d2", dist2("svn", "cvn", "dot"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("vec_id", "s", "code")
  }

  /** Codebooks after one integer-mean Lloyd step from the deterministic
    * seed: sub-slices of the first [[K]] vectors by vec_id (a true
    * order-by-limit — sparse or non-zero-based id spaces still seed K
    * centroids; codes are the seeds' ranks 0..K−1, which coincide with
    * the seed vec_ids on a dense 0-based corpus — the oracle's
    * formulation). */
  private[sim] def trainedBooks(sub: DataFrame): DataFrame = {
    import sub.sparkSession.implicits._
    // Driver-built rank map over K ids — metadata-scale, like the
    // KMeans seed collect.
    val seedCodes = sub.select(col("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(K).collect().map(_.getLong(0))
      .sorted.zipWithIndex.toSeq.toDF("vec_id", "code")
    val init = sub.join(broadcast(seedCodes), Seq("vec_id"))
      .select(col("s"), col("code"), col("sv").as("cv"))
      .withColumn("cvn", expr("graft_dot(cv, cv)"))
    val a0 = assign(sub, init)
    a0.join(sub, Seq("vec_id", "s"))
      .select(col("s"), col("code"),
        posexplode_outer(col("sv")).as(Seq("dim", "x")))
      .filter(col("dim").isNotNull)
      .groupBy(col("s"), col("code"), col("dim"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("c"))
      .withColumn("mx",
        expr("cast(round(cast(sx as double) / c, 0) as bigint)"))
      .groupBy(col("s"), col("code"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, mx))), " +
        "p -> p.mx)").as("cv"))
      .withColumn("cvn", expr("graft_dot(cv, cv)"))
  }

  /** SERVING split (the [[IvfCosine.buildIndex]] pattern): persist the
    * trained codebooks and the encoded corpus so queries never re-train.
    *
    *   `indexDir/books/` (s, code, cv, cvn)   — M·K rows, broadcast;
    *   `indexDir/codes/` (neighbor_id, s, code) — the 32×-compressed
    *                                              corpus encoding.
    *
    * The codes scan is inherent to ADC (every candidate's M codes are
    * summed); composing this with the IVF partitioned-postings layout
    * (IVF-PQ: partition the codes by coarse list id) is how the scan
    * itself gets pruned at 100 TB. */
  def buildIndex(s: SparkSession, dir: String, indexDir: String): Unit = {
    val emb = Similarity.quantized(s, dir).select("vec_id", "q")
      .filter(size(col("q")) === M * SubDim)
    val sub = subVectors(emb)
      .withColumn("svn", expr("graft_dot(sv, sv)"))
      .persist()
    try {
      val books = trainedBooks(sub)
      books.write.mode("overwrite").parquet(s"$indexDir/books")
      assign(sub, s.read.parquet(s"$indexDir/books"))
        .withColumnRenamed("vec_id", "neighbor_id")
        .write.mode("overwrite").parquet(s"$indexDir/codes")
    } finally sub.unpersist()
  }

  /** Query phase against a persisted [[buildIndex]] layout: build the
    * per-query ADC distance tables from the PERSISTED books (broadcast),
    * score the PERSISTED code table with one broadcast join + fixed
    * fan-in sum, rank. No codebook training, no corpus encoding — one
    * Window node total (the final rank; AnnIndexSpec pins it). Identical
    * deterministic output to [[topK]] / the pqTopK oracle. */
  def topKIndexed(s: SparkSession, dir: String, indexDir: String,
                  nQueries: Int = 10, k: Int = 5): DataFrame = {
    graft.functions.SignatureExpressions.register(
      s, 64, Array(1L), Array(0L), 2147483647L)
    val books = s.read.parquet(s"$indexDir/books")
    val codes = s.read.parquet(s"$indexDir/codes")
    val qEmb = Similarity.quantized(s, dir).select("vec_id", "q")
      .filter(size(col("q")) === M * SubDim)
      .filter(col("vec_id") < nQueries)
    val qt = subVectors(qEmb)
      .withColumn("svn", expr("graft_dot(sv, sv)"))
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(books), Seq("s"))
      .withColumn("dot", expr("graft_dot(sv, cv)"))
      .withColumn("qd", dist2("svn", "cvn", "dot"))
      .select("query_id", "s", "code", "qd")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_d2").asc, col("neighbor_id"))
    codes.join(broadcast(qt), Seq("s", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("qd")).as("approx_d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "approx_d2", "rank")
  }

  /** Registered query: ADC top-k for queries vec_id < nQueries over the
    * PQ-encoded corpus (query itself excluded). The score is the PQ
    * APPROXIMATION of squared L2 — the contract is the deterministic
    * index's output, exactly like [[LshCosine.topK]]'s bucket contract;
    * recall vs exact search is a measured property (PqSpec). */
  def topK(s: SparkSession, dir: String, nQueries: Int = 10,
           k: Int = 5): DataFrame = {
    // Full-dimension vectors only (oracle: WHERE len(q) = 64): a short
    // vector's past-the-end slice is an EMPTY array, whose norm is 0 in
    // Spark (graft_dot) but NULL in DuckDB (list_sum) — divergent code
    // assignment. The guard makes the contract explicit instead of
    // conventional.
    val emb = Similarity.quantized(s, dir).select("vec_id", "q")
      .filter(size(col("q")) === M * SubDim)
    val sub = subVectors(emb)
      .withColumn("svn", expr("graft_dot(sv, sv)"))
      .persist()
    val books = trainedBooks(sub)
    val codes = assign(sub, books)
      .withColumnRenamed("vec_id", "neighbor_id")
    // Per-query subspace distance tables: nQueries × M × K rows (tiny).
    val qt = sub.filter(col("vec_id") < nQueries)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(books), Seq("s"))
      .withColumn("dot", expr("graft_dot(sv, cv)"))
      .withColumn("qd", dist2("svn", "cvn", "dot"))
      .select("query_id", "s", "code", "qd")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_d2").asc, col("neighbor_id"))
    val out = codes.join(broadcast(qt), Seq("s", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("qd")).as("approx_d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "approx_d2", "rank")
      .localCheckpoint()
    sub.unpersist()
    out
  }
}
