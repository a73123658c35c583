package graft.sim

import graft.util.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic spherical k-means over the `embeddings` table — the
  * clustering pass a training-data pipeline runs for semantic dedup
  * sharding, topic balancing, or curriculum bucketing.
  *
  * Fully deterministic by construction (no sampled init, no
  * accumulation-order doubles), so the DuckDB oracle replays it exactly:
  * initial centroids are the first k vectors by vec_id, assignment is by
  * quantized integer cosine (ties → lowest cluster id), and the Lloyd
  * update re-quantizes the dimension-wise integer mean (exact integer
  * sums, one correctly-rounded IEEE division, scale-0 round). [[IvfCosine]]
  * trains its coarse quantizer driver-side because nlist·dim is tiny; this
  * is the engine-side formulation that scales the E and M steps to any
  * corpus and cluster cardinality.
  *
  * Plan shape per iteration: assignment = broadcast(k·dim centroids) ⋈
  * scan + per-vector argmax (a doc-keyed window over k rows — bounded
  * fan-out, no shuffle beyond the window's vec_id hash); update =
  * posexplode → (cluster, dim)-keyed hash agg — fixed-width state
  * (k·dim), map-side combined exactly like [[Similarity.embedCentroids]].
  * Nothing grows with N² and the centroid state is k·dim longs at any
  * corpus size. */
object KMeans {

  /** Assign every vector to its nearest centroid by quantized cosine.
    * `cents` must be (cluster, cq, cn) with cn = ∫⟨cq,cq⟩ > 0. */
  private def assign(emb: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("cluster").asc)
    emb.crossJoin(broadcast(cents))
      .withColumn("dot", expr("graft_dot(q, cq)"))
      .withColumn("cosine",
        Num.r(col("dot").cast("double") /
          (sqrt(col("n").cast("double")) * sqrt(col("cn").cast("double"))),
          6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("label"), col("cluster"), col("cosine"))
  }

  /** One Lloyd update: dimension-wise integer mean of each cluster's
    * members, re-quantized to micro-units. Clusters that lose every
    * member drop out (deterministic; the oracle mirrors it). */
  private def update(emb: DataFrame, assigned: DataFrame): DataFrame =
    assigned.select("vec_id", "cluster")
      .join(emb.select("vec_id", "q"), Seq("vec_id"))
      // posexplode_outer: avoids the InferFiltersFromGenerate filter that
      // would re-run the quantization transform twice more per vector.
      .select(col("cluster"), posexplode_outer(col("q"))
        .as(Seq("dim", "qv")))
      .filter(col("dim").isNotNull) // pos-null = empty-array row only
      .groupBy(col("cluster"), col("dim"))
      .agg(sum(col("qv")).as("s"), count(lit(1)).as("c"))
      .withColumn("mq", expr("cast(round(cast(s as double) / c, 0) " +
        "as bigint)"))
      .groupBy(col("cluster"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, mq))), " +
        "p -> p.mq)").as("cq"))
      .withColumn("cn", expr("graft_dot(cq, cq)"))
      .filter(col("cn") > 0)

  /** `iters` Lloyd refinements from the deterministic seed (the first k
    * vectors by vec_id — a true order-by-limit, so sparse or non-zero-
    * based id spaces still select k seeds); returns the final assignment
    * (vec_id, label, cluster, cosine). Cluster ids are the seeds' ranks
    * 0..k−1, which on a dense 0-based corpus coincide with the seed
    * vec_ids — the oracle's formulation. */
  def fit(s: SparkSession, dir: String, k: Int = 8,
          iters: Int = 1): DataFrame = {
    import s.implicits._
    // Zero-norm vectors are excluded on both engines (cosine undefined:
    // Spark would score them NaN — which sorts above every real cosine —
    // where DuckDB scores NULL). Persist the quantized frame: it feeds
    // 2 + 2·iters subtrees (each assign and update), which would
    // otherwise re-run the quantization transform per lineage; the
    // eager localCheckpoint of the result lets it unpersist here instead
    // of leaking past return.
    val emb = Similarity.quantizedNonZero(s, dir).persist()
    // Seed selection is a TakeOrderedAndProject + driver build (k·dim
    // longs — metadata-scale, the IvfCosine centroid pattern); a window
    // would be partition-less (PlanSpec forbids) and `vec_id < k` would
    // under-seed sparse id spaces.
    val init = emb.select(col("vec_id"), col("q"), col("n"))
      .orderBy(col("vec_id")).limit(k).collect()
      .sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](1), r.getLong(2)) }
      .toSeq.toDF("cluster", "cq", "cn")
    var cents = init
    var assigned = assign(emb, cents)
    for (i <- 1 to iters) {
      cents = update(emb, assigned)
      assigned = assign(emb, cents)
      // Truncate lineage at each refinement boundary: without this,
      // iteration i's plan nests all prior assign/update subtrees and
      // re-executes them multiplicatively for iters > 1. The final
      // iteration is checkpointed below as the result.
      if (iters > 1 && i < iters) assigned = assigned.localCheckpoint()
    }
    val out = assigned.localCheckpoint()
    emb.unpersist()
    out
  }
}
