package graft.sim

import graft.util.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-quality evaluation: leave-one-out 1-NN label accuracy —
  * for every vector, does its single nearest neighbor (exact quantized
  * cosine, self excluded) carry the same label? Reported per label. The
  * standard cheap probe of whether an embedding space separates its
  * classes, run before anyone trains on retrieval output.
  *
  * Arm-decided plan (the [[graft.text.MinHashDedup.Arm]] idiom — the
  * registered query MEASURES its input instead of assuming it is an
  * eval sample):
  *
  *   - '''[[BruteArm]]''' (n ≤ [[BruteBudget]]): the
  *     [[Similarity.allPairsCosine]] blocked triangular self-join scores
  *     each unordered pair exactly once; both orientations are then
  *     emitted (a 2× narrow union of (vec, neighbor, cosine) rows — no
  *     second scoring pass). Exact by definition; O(n²), which is the
  *     right plan for the eval-sample sizes the budget admits.
  *   - '''[[IvfArm]]''' (n > [[BruteBudget]]): candidates are routed
  *     through the same inverted-file structure as [[IvfCosine]] —
  *     train nlist ≈ √n coarse centroids, assign every vector to its
  *     single list (the postings side), probe each vector's nprobe
  *     nearest lists, and score only the probed lists' members with the
  *     IDENTICAL exact quantized cosine. Candidate volume is
  *     ≈ n²·nprobe/nlist ≈ n^1.5·nprobe — sub-quadratic, and every join
  *     is an equi-join on `cluster_id` (PlanSpec pins: no all-pairs
  *     generator, no nested-loop join). With covering nprobe (= nlist)
  *     the candidate set is complete and the output is cell-identical
  *     to the brute arm (KnnEvalSpec proves it); at the default
  *     sub-covering nprobe the 1-NN is approximate with the standard
  *     IVF recall contract — misses only vectors whose true 1-NN lives
  *     outside their nprobe nearest lists, vanishingly rare for the
  *     clustered corpora a label-accuracy eval presumes.
  *
  * Both arms end in the same per-vector argmax — a HASH aggregate
  * `max(struct(cosine, -neighbor))` (highest cosine, ties to the
  * smallest neighbor id; bounded state, no per-vector sort) — and the
  * same per-label roll-up, so the arms differ ONLY in candidate
  * generation. Deterministic end-to-end (integer cosine scoring,
  * total-order tie-break), so the DuckDB all-pairs oracle replays the
  * brute arm exactly. */
object KnnEval {

  /** Candidate-generation arm (the measured-AutoArm family). */
  sealed trait Arm
  /** Force the exact blocked all-pairs generator. */
  case object BruteArm extends Arm
  /** Force the IVF-list candidate generator. */
  case object IvfArm extends Arm
  /** Measure n and choose: brute within [[BruteBudget]], IVF past it. */
  case object AutoArm extends Arm

  /** Brute-arm row budget. 65,536 rows ⇒ ≈ 2.1e9 scored pairs — with
    * the 64-way triangular blocking that is ~33M integer-dot pairs per
    * block-pair task, comfortably one task's work on one core, and the
    * whole eval is minutes on a single executor. One step past the
    * budget the quadratic stops fitting anywhere (1e9 vectors ⇒ 5e17
    * pairs), which is exactly when the n^1.5 IVF route must take over —
    * the same measured-gate reasoning as
    * [[graft.text.MinHashDedup.PrefixBudgetPerDoc]]. */
  val BruteBudget: Long = 65536L

  /** The [[AutoArm]] rule, exposed for specs: brute force at or within
    * the budget, IVF candidates past it. */
  def selectArm(n: Long): Arm =
    if (n <= BruteBudget) BruteArm else IvfArm

  /** Per-label rows: label, n_vectors, n_correct, accuracy (scale 4).
    *
    * `nprobe`/`nlist` shape only the [[IvfArm]]: nlist defaults to
    * max(16, ⌈√n⌉) (the classical IVF balance point — list size ≈ √n ⇒
    * probe cost ≈ nprobe·√n per query); pass `nprobe = nlist` for the
    * covering contract (exact, used by KnnEvalSpec's equality proof). */
  def labelAccuracy(s: SparkSession, dir: String, arm: Arm = AutoArm,
                    nprobe: Int = 8, nlist: Int = 0): DataFrame = {
    val emb = Similarity.quantizedNonZero(s, dir)
    // The arm gate measures the TABLE row count — a parquet
    // metadata-only count (footer row counts, no column scan), so the
    // AutoArm decision costs milliseconds at any corpus size. The
    // zero-norm exclusion shifts n by at most the degenerate-row count,
    // irrelevant to a power-of-two budget boundary or a √n list count.
    val n = if (arm == AutoArm || (arm == IvfArm && nlist <= 0))
      s.read.parquet(s"$dir/embeddings.parquet").count()
    else 0L
    val resolved = arm match {
      case AutoArm => selectArm(n)
      case a       => a
    }
    val sym = resolved match {
      case IvfArm =>
        val lists =
          if (nlist > 0) nlist
          else math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
        ivfCandidates(s, dir, emb, lists, math.min(nprobe, lists))
      case _ => bruteCandidates(emb)
    }
    accuracyOf(sym, emb)
  }

  /** Exact generator: every unordered pair once, both orientations out. */
  private def bruteCandidates(emb: DataFrame): DataFrame = {
    val pairs = Similarity.allPairsCosine(emb)
    pairs.select(col("vec_a").as("vec"),
        col("vec_b").as("neighbor"), col("cosine"))
      .unionByName(pairs.select(col("vec_b").as("vec"),
        col("vec_a").as("neighbor"), col("cosine")))
  }

  /** IVF generator: (vec, neighbor, cosine) for every vector × member
    * of its nprobe probed lists. Postings carry only ids through the
    * probe equi-join; the KB-scale quantized arrays attach by id-keyed
    * joins for the final exact scoring — the [[IvfCosine.buildIndex]]
    * layout computed inline (a persisted index slots in identically:
    * at serving scale the postings side IS
    * `indexDir/postings/cluster_id=<c>/` and the probe join prunes to
    * the probed partitions). */
  private def ivfCandidates(s: SparkSession, dir: String, emb: DataFrame,
                            nlist: Int, nprobe: Int): DataFrame = {
    // localCheckpoint, not cache-and-unpersist: the returned frame is
    // LAZY, so a finally-unpersist would drop the cache before the
    // probes and postings subtrees ever execute and the normalization
    // pipeline would run twice more at query time. The checkpoint
    // materializes once, serves the training collects AND both query
    // subtrees, and its blocks free with the RDD's garbage collection.
    val nv = IvfCosine.normalized(
      s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
      .localCheckpoint()
    val centroids = IvfCosine.trainNormalized(nv, nlist, iters = 3)
    // Postings: one list per vector (rn = 1 assignment), ids only.
    val postings = IvfCosine.assign(nv, centroids)
      .select(col("vid").as("neighbor"), col("cluster_id"))
    // Probes: each vector's nprobe nearest lists.
    val probeW = Window.partitionBy(col("vid"))
      .orderBy(col("dot").desc, col("cluster_id"))
    val probes = nv.crossJoin(broadcast(centroids))
      .withColumn("dot", expr(IvfCosine.dotExpr))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("vid").as("vec"), col("cluster_id"))
    probes.join(postings, Seq("cluster_id"))
      .filter(col("vec") =!= col("neighbor"))
      .join(emb.select(col("vec_id").as("vec"), col("q").as("qa"),
        col("n").as("na")), Seq("vec"))
      .join(emb.select(col("vec_id").as("neighbor"), col("q").as("qb"),
        col("n").as("nb")), Seq("neighbor"))
      .withColumn("dotq", expr("graft_dot(qa, qb)"))
      .withColumn("cosine",
        Num.r(col("dotq").cast("double") /
          (sqrt(col("na").cast("double")) *
            sqrt(col("nb").cast("double"))), 6))
      .select("vec", "neighbor", "cosine")
  }

  /** Shared tail: per-vector 1-NN argmax, label joins, per-label
    * accuracy roll-up. */
  private def accuracyOf(sym: DataFrame, emb: DataFrame): DataFrame = {
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
