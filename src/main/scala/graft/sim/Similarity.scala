package graft.sim

import graft.functions.SignatureExpressions
import graft.util.{Layout, Num}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float], 64-dim).
  *
  * Embeddings are quantized to integer micro-units (×10⁶, round) before any
  * arithmetic: integer dot products and norms are exact and
  * order-independent, so Spark's sequential array fold and DuckDB's list_sum
  * agree bit-for-bit; only the final cosine (one division + two sqrt on
  * identical doubles) touches floating point, and IEEE sqrt/÷ are correctly
  * rounded in both engines.
  *
  * Brute-force top-k is the correctness baseline; the scale path is
  * [[IvfCosine]] (inverted-file candidate lists, exact re-scoring),
  * verified against this baseline in ScalaTest and by the shared oracle.
  */
object Similarity {

  /** vec_id, q (quantized Array[Long]), n (integer squared norm). */
  def quantized(s: SparkSession, dir: String): DataFrame = {
    SignatureExpressions.register(s, 64, Array(1L), Array(0L),
      2147483647L)
    Layout.spread(s.read.parquet(s"$dir/embeddings.parquet"))
      .withColumn("q", expr(
        "transform(embedding, x -> " +
          "cast(round(cast(x as double) * 1000000, 0) as bigint))"))
      .withColumn("n", expr("graft_dot(q, q)"))
      .select("vec_id", "label", "q", "n")
  }

  /** [[quantized]] minus zero-norm vectors — the frame every COSINE
    * consumer must score against: 0/0 is NaN in Spark but NULL in
    * DuckDB (and NaN sorts ABOVE every real cosine in Spark), so a
    * vector that quantizes to all zeros would silently diverge the two
    * engines and poison top-k rankings. Both sides exclude them
    * (`WHERE nn > 0` in the cosine oracles); aggregate consumers
    * (embedCentroids) keep the full frame — means are defined there. */
  def quantizedNonZero(s: SparkSession, dir: String): DataFrame =
    quantized(s, dir).filter(col("n") > 0)

  /** Candidate-generation arm for [[cosineNearDup]] (the
    * [[graft.text.MinHashDedup.Arm]] / [[graft.text.ContainmentDedup.Arm]]
    * pattern — the registered query REASONS about its arm instead of
    * hard-wiring one). */
  sealed trait Arm
  /** Force the sign-LSH bucketed candidate join. */
  case object LshArm extends Arm
  /** Force the blocked triangular exact self-join. */
  case object BlockArm extends Arm
  /** Choose by the derived LSH selectivity T·2^−b: below 1 the bucket
    * join prunes; at or above 1 it EXPANDS (the candidate shuffle would
    * carry ≥ n²/2 rows, duplicated across tables, plus a distinct), so
    * scanning each pair exactly once is strictly cheaper. */
  case object AutoArm extends Arm

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs whose
    * quantized cosine meets the threshold — the embedding-space flavor of
    * the dedup family.
    *
    * Arm-decided plan. At selective thresholds (τ ≥ ~0.7) hyperplane-LSH
    * buckets with threshold-derived (bits, tables) from
    * [[LshCosine.deriveParams]] generate candidate pairs via a per-table
    * bucket EQUI self-join — never a cross join — and survivors are
    * re-ranked with the exact quantized integer cosine; candidate
    * coverage of every qualifying pair is a deterministic property of
    * the fixed seed-7 hyperplanes + corpus (SimLshSpec asserts the LSH
    * arm == exact all-pairs), with per-pair miss probability ≤ 1e-4 by
    * construction. At low thresholds the same derivation yields
    * T·2^−b ≥ 1 — EVERY LSH family degenerates there (Charikar's
    * collision bound: a τ=0.4 pair agrees per bit w.p. only ~0.63, so
    * recall needs more tables than the buckets prune) — and AutoArm
    * switches to the blocked triangular self-join that scans each of the
    * n²/2 pairs exactly ONCE ([[blockedNearDup]]): the optimal exact
    * plan in the regime where no sub-quadratic candidate generator
    * exists. Both arms end in the identical exact scoring expression, so
    * the all-pairs DuckDB oracle matches cell-for-cell either way.
    *
    * At 100 TB the LSH arm's bucket id is the shuffle key: candidates =
    * Σ_tables Σ_buckets n_b², selectivity T·2^−b vs random pairs —
    * strongly sub-quadratic at real near-dup thresholds; no vector
    * arrays travel through the candidate shuffle — only
    * (vec_id, tbl, bucket) longs; the KB-scale q arrays join back in
    * only for the final exact re-rank. */
  def cosineNearDup(s: SparkSession, dir: String,
                    threshold: Double = 0.4,
                    arm: Arm = AutoArm): DataFrame =
    nearDup(quantizedNonZero(s, dir), threshold, arm)

  /** Arm dispatch (shared by both registered thresholds). */
  private[graft] def nearDup(emb: DataFrame, threshold: Double,
                             arm: Arm): DataFrame = {
    val (bits, tables) = LshCosine.deriveParams(threshold)
    val block = arm match {
      case BlockArm => true
      case LshArm   => false
      case AutoArm  => tables.toDouble / (1L << bits) >= 1.0
    }
    if (block) blockedNearDup(emb, threshold)
    else bucketedNearDup(emb, threshold)
  }

  /** Plant offset for [[cosineNearDupT85]]'s derived duplicates. */
  val PlantOffset = 1000000L

  /** [[quantizedNonZero]] unioned with an exactly-DOUBLED copy of every
    * vector under `vec_id + PlantOffset`: q′ = 2q (integer, exact in both
    * engines), n′ = 4n. Doubling preserves the sign of every hyperplane
    * dot product, so each copy lands in the SAME sign-LSH bucket as its
    * original in every table — planted-pair recall through the bucket
    * join is deterministic, not probabilistic — and cosine(q, 2q) rounds
    * to exactly 1.0 at scale 6 in both engines. */
  private def plantedNonZero(s: SparkSession, dir: String): DataFrame = {
    val base = quantizedNonZero(s, dir)
    // Guard the id arithmetic: a corpus whose vec_ids reach the offset
    // would alias planted copies onto REAL vectors — and the oracle
    // would replay the same collision, going green on a semantically
    // wrong answer. One metadata-scale aggregate; fail loud instead.
    val maxId = base.agg(coalesce(max(col("vec_id")), lit(-1L)))
      .head().getLong(0)
    require(maxId < PlantOffset,
      s"vec_id $maxId >= PlantOffset $PlantOffset: planted ids would " +
        "alias real vectors")
    base.unionByName(base
      .withColumn("vec_id", col("vec_id") + lit(PlantOffset))
      .withColumn("q", expr("transform(q, v -> v * 2L)"))
      .withColumn("n", col("n") * 4))
  }

  /** Registered sub-quadratic-regime variant of [[cosineNearDup]]:
    * τ = 0.85, where [[LshCosine.deriveParams]] yields (9 bits, 53
    * tables) and bucket selectivity T·2^−b ≈ 0.10 — the regime the
    * bucketed design exists for (at the τ = 0.4 query the selectivity
    * floor makes LSH ~all-pairs; BASELINE.md). The measured corpus has
    * ZERO organic pairs at 0.85, which would make the row vacuous, so
    * the query unions in [[plantedNonZero]]'s doubled copies: the output
    * is exactly one (vec_id, vec_id + PlantOffset, 1.0) row per nonzero
    * vector, and the all-pairs DuckDB oracle replays the same union. */
  def cosineNearDupT85(s: SparkSession, dir: String): DataFrame =
    nearDup(plantedNonZero(s, dir), 0.85, AutoArm)

  /** Exact scoring shared by every candidate arm: the quantized integer
    * cosine, rounded by the portable scale-0 rule, ≥-filtered. Inputs
    * carry (vec_a, qa, na, vec_b, qb, nb); cosine is symmetric so the
    * caller may pass either orientation and normalize ids afterward. */
  private def scorePairs(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("dot", expr("graft_dot(qa, qb)"))
      .withColumn("cosine",
        Num.r(col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
          6))
      .filter(col("cosine") >= threshold)

  /** The two-stage bucketed LSH plan over a quantized frame. */
  private def bucketedNearDup(emb: DataFrame,
                              threshold: Double): DataFrame = {
    val (bits, tables) = LshCosine.deriveParams(threshold)
    val idx = LshCosine.bucketsFor(emb, tables, bits)
    val cands = idx.select(col("vec_id").as("vec_a"), col("tbl"),
        col("bucket"))
      .join(idx.select(col("vec_id").as("vec_b"), col("tbl"),
        col("bucket")), Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
      .distinct()
    scorePairs(cands
      .join(emb.select(col("vec_id").as("vec_a"), col("q").as("qa"),
        col("n").as("na")), Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"), col("q").as("qb"),
        col("n").as("nb")), Seq("vec_b")), threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** Block count for [[blockedNearDup]]. Triangular block pairs =
    * B(B+1)/2 (2,080 at 64) — broadcast-size metadata; per-reducer pair
    * volume scales as (n/B)², so at corpus scale B grows with √n to
    * keep a block pair inside one task's memory. 64 over-parallelizes
    * local[32] without fragmenting the harness corpora. */
  val NearDupBlocks: Int = 64

  /** Blocked triangular exact self-join — the low-threshold arm. Every
    * unordered pair is scanned exactly once: rows are hashed into B
    * blocks, the B(B+1)/2 ordered block pairs (ba ≤ bb) are a
    * driver-built broadcast frame, and two EQUI joins (never a
    * cartesian: left⋈blockPairs on ba is a broadcast hash join, then
    * ⋈right on bb) materialize each block pair once — diagonal pairs
    * keep vec_a < vec_b, cross-block pairs appear only under ba < bb
    * and are id-normalized after scoring (cosine is symmetric). Unlike
    * the LSH arm there is no candidate distinct and no ×T table
    * duplication: shuffle volume is one B-way fan-out of the left ids +
    * vectors (×(B−ba) ≈ ×B/2 average — bounded metadata-scale
    * replication, NOT pair-scale) and the n²/2 scoring happens inside
    * the join's generated loop with no further exchange. */
  private def blockedNearDup(emb: DataFrame,
                             threshold: Double): DataFrame = {
    val s = emb.sparkSession
    val b = NearDupBlocks
    import s.implicits._
    val blockPairs = (for { i <- 0 until b; j <- i until b } yield (i, j))
      .toDF("ba", "bb")
    val left = emb.select(col("vec_id").as("vec_a"), col("q").as("qa"),
      col("n").as("na"), pmod(hash(col("vec_id")), lit(b)).as("ba"))
    val right = emb.select(col("vec_id").as("vec_b"), col("q").as("qb"),
      col("n").as("nb"), pmod(hash(col("vec_id")), lit(b)).as("bb"))
    val pairs = left.join(broadcast(blockPairs), Seq("ba"))
      .join(right, Seq("bb"))
      // one orientation per unordered pair: strict id order inside the
      // diagonal block, block order decides across blocks
      .filter(col("ba") =!= col("bb") || col("vec_a") < col("vec_b"))
    scorePairs(pairs, threshold)
      .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
        greatest(col("vec_a"), col("vec_b")).as("vec_b"), col("cosine"))
  }

  /** Every unordered pair exactly-once with its exact quantized cosine
    * (no threshold cut — the round-6 floor −1.0 passes everything):
    * the blocked triangular plan exposed for consumers that need the
    * FULL pairwise structure, e.g. [[KnnEval]]'s leave-one-out 1-NN. */
  private[sim] def allPairsCosine(emb: DataFrame): DataFrame =
    blockedNearDup(emb, -1.0)

  /** Exact all-pairs baseline for [[cosineNearDup]] — O(N²), spec-only:
    * SimLshSpec proves the bucketed candidate arm loses nothing against
    * this at the registered threshold. Not registered as a query. */
  def cosineNearDupExact(s: SparkSession, dir: String,
                         threshold: Double = 0.4): DataFrame = {
    val emb = quantizedNonZero(s, dir)
    val a = emb.select(col("vec_id").as("vec_a"), col("q").as("qa"),
      col("n").as("na"))
    val b = emb.select(col("vec_id").as("vec_b"), col("q").as("qb"),
      col("n").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("dot", expr("graft_dot(qa, qb)"))
      .withColumn("cosine",
        Num.r(col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
          6))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** Brute-force cosine top-k for the first `nQueries` vectors.
    * The query side is tiny ⇒ broadcast; the candidate scan is a single
    * pass, no shuffle until the per-query top-k window. */
  def cosineTopK(s: SparkSession, dir: String, nQueries: Int = 10,
                 k: Int = 5): DataFrame = {
    val emb = quantizedNonZero(s, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("n").as("qn"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("q").as("cv"),
      col("n").as("cn"))
    val scored = broadcast(q).join(c,
        col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", expr("graft_dot(qv, cv)"))
      .withColumn("cosine",
        Num.r(col("dot").cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double"))),
          6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Per-label embedding centroids, dimension-wise: posexplode each
    * quantized vector to (label, dim, q) rows and hash-aggregate integer
    * sums — the distributed mean that k-means / class-prototype /
    * nearest-centroid pipelines run every iteration ([[IvfCosine]] trains
    * its coarse centroids the same way, driver-side, because its k·64
    * state is tiny; this is the engine-side form that scales to any label
    * cardinality). The explode is narrow (64 rows per vector); the single
    * shuffle carries (label, dim) partial sums — fixed width regardless of
    * corpus size. Integer sums are exact, so the mean (one IEEE division,
    * scale-0 round) matches DuckDB cell-for-cell. */
  def embedCentroids(s: SparkSession, dir: String): DataFrame =
    // posexplode_outer: the plain form's inferred size/isnotnull filter
    // (InferFiltersFromGenerate) re-runs the quantization transform twice
    // more per vector after pushdown; q is never empty, so outer emits
    // the same rows without the synthesized filter.
    quantized(s, dir)
      .select(col("label"), posexplode_outer(col("q")).as(Seq("dim", "qv")))
      // Filter on the POSITION column: only the spurious row an empty
      // array emits has a null pos — a legitimately-null array ELEMENT
      // keeps plain-posexplode semantics (the oracle counts it).
      .filter(col("dim").isNotNull)
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("qv")).as("sum_q"))
      .withColumn("mean_q", Num.ratio(col("sum_q"), col("n_vectors"), 2))
}
