package graft.sim

import graft.util.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup-style cluster-scoped semantic deduplication (Abbas et al.
  * 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication"): cluster the embedding corpus with k-means, then find
  * near-duplicate pairs ONLY within each cluster and keep one
  * representative per duplicate relation — the member FARTHEST from its
  * centroid (the paper's keep-the-outlier rule, which preserves diversity
  * at the cluster edge), with the lower vec_id winning exact ties.
  *
  * This is the third candidate-generation geometry in the embedding-dedup
  * family: [[Similarity.embeddingNearDup]] buckets by hyperplane LSH,
  * [[IvfCosine]] by a coarse quantizer for top-k; here the k-means
  * partition itself bounds the pair search. Per-cluster pair count is
  * Σ n_c² — with k grown ∝ √N (the paper runs 110k clusters for 5B
  * embeddings) the expected pair volume is N²/k = N^1.5, and each
  * cluster's pairs shuffle independently on the cluster key, so no
  * executor ever holds more than one cluster's candidate block. The
  * scoring reuses the exact integer-quantized cosine ([[Similarity]]):
  * every dropped/kept decision depends only on exactly recomputable
  * quantities, so the DuckDB oracle replays assignment, pairing and the
  * dominance rule cell-for-cell.
  *
  * Dominance rule (deterministic greedy, clique-exact): vector `a` is
  * dropped iff some same-cluster near-dup `b` (quantized cosine ≥ τ) has
  * (centroid-cosine, vec_id) lexicographically below `a`'s. Within a
  * fully-connected duplicate group this keeps exactly the minimal member
  * (the paper's choice); on chains it is the paper's own greedy
  * per-pair behavior.
  *
  * Reference scope: the reference pipeline has no embedding ops at all
  * (`/root/reference/src/spark` is events-only); this is part of the
  * LLM-training-data extension surface.
  */
object SemDedup {

  /** keep/drop verdict per assigned vector: (vec_id, label, cluster,
    * keep). τ is the intra-cluster duplicate threshold on the quantized
    * cosine (rounded to 6 decimals on both engines). */
  def dedup(s: SparkSession, dir: String, k: Int = 8, iters: Int = 1,
            tau: Double = 0.80): DataFrame = {
    // Assignment frame: (vec_id, label, cluster, cosine-to-centroid).
    // Already lineage-truncated (localCheckpoint) by KMeans.fit, so the
    // self-join below re-reads the materialized assignment, not two
    // copies of the Lloyd iteration.
    val assigned = KMeans.fit(s, dir, k, iters)
    val emb = Similarity.quantizedNonZero(s, dir).select("vec_id", "q", "n")
    val m = assigned.join(emb, Seq("vec_id"))
    def side(sfx: String) = m.select(
      col("cluster"),
      col("vec_id").as(s"id_$sfx"),
      col("cosine").as(s"cent_$sfx"),
      col("q").as(s"q_$sfx"),
      col("n").as(s"n_$sfx"))
    // Equi self-join on the cluster key (never a cross join): the
    // dominance pre-filter halves the pair volume before the dot product
    // runs, and only dominated near-dups survive to the distinct.
    val dropped = side("a").join(side("b"), Seq("cluster"))
      .filter(col("cent_b") < col("cent_a") ||
        (col("cent_b") === col("cent_a") && col("id_b") < col("id_a")))
      .withColumn("dot", expr("graft_dot(q_a, q_b)"))
      .withColumn("cos", Num.r(col("dot").cast("double") /
        (sqrt(col("n_a").cast("double")) * sqrt(col("n_b").cast("double"))),
        6))
      .filter(col("cos") >= tau)
      .select(col("id_a").as("vec_id")).distinct()
      .withColumn("dropped", lit(true))
    assigned.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"), col("cluster"),
        coalesce(col("dropped"), lit(false)).unary_!.as("keep"))
  }
}
