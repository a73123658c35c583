package graft.sim

import graft.util.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-quality evaluation: leave-one-out 1-NN label accuracy —
  * for every vector, does its single nearest neighbor (exact quantized
  * cosine, self excluded) carry the same label? Reported per label. The
  * standard cheap probe of whether an embedding space separates its
  * classes, run before anyone trains on retrieval output.
  *
  * Plan: the [[Similarity.allPairsCosine]] blocked triangular self-join
  * scores each unordered pair exactly once; both orientations are then
  * emitted (a 2× narrow union of (vec, neighbor, cosine) rows — no
  * second scoring pass) and the per-vector argmax is a HASH aggregate
  * `max(struct(cosine, -neighbor))` — highest cosine, ties to the
  * smallest neighbor id; bounded state, no per-vector sort. Labels join
  * in twice by id (narrow, id-keyed). Exact brute force is O(n²) by
  * definition — the eval runs on an evaluation SAMPLE; at corpus scale
  * the same argmax consumes [[IvfCosine]]/[[ProductQuantizer]] candidate
  * lists instead of the blocked generator.
  *
  * Deterministic end-to-end (integer cosine scoring, total-order
  * tie-break), so the DuckDB all-pairs oracle replays it exactly. */
object KnnEval {

  /** Per-label rows: label, n_vectors, n_correct, accuracy (scale 4). */
  def labelAccuracy(s: SparkSession, dir: String): DataFrame = {
    val emb = Similarity.quantizedNonZero(s, dir)
    val pairs = Similarity.allPairsCosine(emb)
    val sym = pairs.select(col("vec_a").as("vec"),
        col("vec_b").as("neighbor"), col("cosine"))
      .unionByName(pairs.select(col("vec_b").as("vec"),
        col("vec_a").as("neighbor"), col("cosine")))
    val nn = sym
      .groupBy(col("vec"))
      .agg(max(struct(col("cosine"), (-col("neighbor")).as("neg_n")))
        .as("best"))
      .select(col("vec"), (-col("best.neg_n")).as("neighbor"))
    val labels = emb.select(col("vec_id"), col("label"))
    nn
      .join(labels.select(col("vec_id").as("vec"),
        col("label").as("label")), Seq("vec"))
      .join(labels.select(col("vec_id").as("neighbor"),
        col("label").as("nn_label")), Seq("neighbor"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("nn_label") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("accuracy",
        Num.ratio(col("n_correct"), col("n_vectors"), 4))
  }
}
