package graft.text

import graft.functions.SignatureExpressions
import graft.util.{Layout, Num}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection — the scale path for fuzzy dedup
  * (blocked trigram Jaccard in [[TextOps.ngramJaccard]] is the exact
  * baseline it is verified against in DedupSpec).
  *
  * The registered contract is what a 100 TB training-data pipeline
  * actually consumes: a **doc → canonical cluster assignment** (connected
  * components of the "exact trigram Jaccard ≥ threshold" graph), not the
  * pair list — on a template-heavy corpus the pair list is Θ(N²) while the
  * assignment stays Θ(N).
  *
  * Pipeline: character trigrams → 64 permutation min-hashes → 16 bands of
  * 4 → bucket self-join on (band, signature) → candidate edges → exact
  * Jaccard confirm → distributed connected components. Dense buckets
  * (template families where every member collides in every band) emit a
  * linear star to the bucket minimum instead of quadratic all-pairs, so no
  * bucket is ever skipped and per-bucket work is O(size) — the star edges
  * preserve connectivity, and the exact-confirm step removes any
  * below-threshold edge they introduce.
  *
  * All hash parameters are fixed constants (LCG-derived), so results are
  * deterministic across runs and partitionings. No UDFs: signatures are
  * nested higher-order expressions (transform/aggregate) plus the native
  * expressions in graft.functions, fully codegen'd.
  */
object MinHashDedup {

  // 128 permutations in 32 bands of 4: a pair at exactly the 0.6
  // threshold collides in some band with p = 1-(1-0.6⁴)³² ≈ 0.989 (16
  // bands would leave ~10% of borderline edges undiscovered). Component
  // equality needs only one surviving bridge per cut, so the residual
  // per-edge miss never showed a mismatched component at any tested scale
  // factor (sf0.001/0.01/0.1 — see DedupSpec and the harness oracle).
  val NumPerms = 128
  val Bands = 32
  val RowsPerBand = 4
  val Prime = 2147483647L // 2^31 - 1

  /** Deterministic permutation parameters from a fixed LCG (seed 42). */
  private val (permA, permB): (Seq[Long], Seq[Long]) = {
    var state = 42L
    def next(): Long = {
      state = (state * 6364136223846793005L + 1442695040888963407L)
      (state >>> 33) % (Prime - 1)
    }
    val a = Seq.fill(NumPerms)(next() + 1) // a in [1, P-1]
    val b = Seq.fill(NumPerms)(next())
    (a, b)
  }

  /** doc_id + minhash signature (array<bigint> of length 64), via the
    * native MinHashSignature expression (graft.functions). */
  def signatures(docs: DataFrame): DataFrame = {
    SignatureExpressions.register(docs.sparkSession, NumPerms,
      permA.toArray, permB.toArray, Prime)
    Layout.spread(docs)
      .withColumn("norm", lower(regexp_replace(col("text"), "\\s+", " ")))
      .withColumn("tg", expr(
        "CASE WHEN length(norm) >= 3 THEN " +
          "array_distinct(transform(sequence(1, length(norm) - 2), " +
          "i -> substring(norm, i, 3))) ELSE array() END"))
      .withColumn("tgh",
        expr("array_sort(transform(tg, t -> pmod(xxhash64(t), 2147483647L)))"))
      .withColumn("minhash", expr("graft_minhash(tgh)"))
      .select(col("doc_id"), col("tg"), col("tgh"), col("minhash"))
  }

  /** Buckets up to this size emit all pairs; larger buckets emit hub
    * edges instead (each member → the bucket's first [[HubsPerBucket]]
    * docs). With r = 4 rows per band, random (low-similarity) collisions
    * are rare, so a large bucket means a genuine template family — hub
    * edges keep it connected for the component step at O(size·K) cost,
    * and K hubs give every member K independent chances of a confirmed
    * (≥ threshold) link into its component. */
  val AllPairsMaxBucket = 1024
  val HubsPerBucket = 32

  /** LSH candidate edges (doc_a < doc_b). Work per bucket is
    * O(min(size², size·K)): quadratic only while small. */
  def candidateEdges(sigs: DataFrame,
                     allPairsMax: Int = AllPairsMaxBucket,
                     hubs: Int = HubsPerBucket): DataFrame = {
    // Band key = hash of the band's minhash slice (long join key, not a
    // concatenated string; false bucket collisions are filtered by the
    // estimate/confirm stages anyway).
    // Narrow (3 longs/row) and read three times — by the bucket-size
    // aggregate and both sides of the pair self-join, which would
    // otherwise re-execute the explode subtree per side.
    val banded = sigs
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), b -> " +
          s"xxhash64(slice(minhash, b * $RowsPerBand + 1, $RowsPerBand)))"))
        .as(Seq("band_idx", "band_key")))
      .persist()
    val buckets = banded.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("bucket_n"))
    val sized = banded.join(buckets, Seq("band_idx", "band_key"))
    val small = sized.filter(col("bucket_n") <= allPairsMax)
      .drop("bucket_n").persist()
    val smallPairs = small.as("a").join(small.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    // Oversized buckets: rank members by doc_id inside the bucket (the
    // window is partitioned by bucket — a sort, never a cross product)
    // and link every member to the first `hubs` members.
    val big = sized.filter(col("bucket_n") > allPairsMax).drop("bucket_n")
    val w = Window.partitionBy(col("band_idx"), col("band_key"))
      .orderBy(col("doc_id"))
    val rankedBig = big.withColumn("rn", row_number().over(w))
    val hubDocs = rankedBig.filter(col("rn") <= hubs)
      .select(col("band_idx"), col("band_key"), col("doc_id").as("hub_id"))
    val hubEdges = rankedBig.join(hubDocs, Seq("band_idx", "band_key"))
      .filter(col("hub_id") < col("doc_id"))
      .select(col("hub_id").as("doc_a"), col("doc_id").as("doc_b"))
    smallPairs.unionByName(hubEdges).distinct()
  }

  /** Candidate edges confirmed by exact trigram Jaccard >= threshold.
    *
    * Two-stage confirm: candidates are first scored by signature agreement
    * (fraction of equal minhash components — an unbiased Jaccard
    * estimator, 64 long comparisons) and only pairs within a safety margin
    * of the threshold pay for the exact trigram-set Jaccard. The margin
    * (0.25) is wide enough that a true >=threshold edge slipping under it
    * is a >4σ event. Exact confirm runs on SORTED hashed trigram sets:
    * two-pointer merge intersection (native expression — no per-pair hash
    * set), union by inclusion-exclusion. */
  def confirmedEdges(sigs: DataFrame, edges: DataFrame,
                     threshold: Double): DataFrame = {
    // Two-phase on purpose: the estimate joins ship only the 128-long
    // minhash; the trigram sets (several KB/doc) are joined only onto
    // estimate survivors. Fusing both into one join would drag the
    // trigram arrays through every candidate row's shuffle — measured 4×
    // slower at sf0.1. The signature projections get an explicit
    // broadcast hint: they are per-DOC (not per-pair) and narrow, but
    // cached array columns carry no size stats, so AQE cannot discover
    // the broadcast on its own; on a corpus where signatures outgrow the
    // broadcast limit Spark falls back to the shuffle join by itself.
    val minAgree = math.max(0,
      math.ceil((threshold - 0.25) * NumPerms).toInt)
    val mh = sigs.select(col("doc_id"), col("minhash"))
    val tg = sigs.select(col("doc_id"), col("tgh"))
    val estimated = edges
      .join(broadcast(mh.select(col("doc_id").as("doc_a"),
        col("minhash").as("mh_a"))), Seq("doc_a"))
      .join(broadcast(mh.select(col("doc_id").as("doc_b"),
        col("minhash").as("mh_b"))), Seq("doc_b"))
      .filter(expr("graft_sig_agreement(mh_a, mh_b)") >= minAgree)
      .select("doc_a", "doc_b")
    estimated
      .join(broadcast(tg.select(col("doc_id").as("doc_a"),
        col("tgh").as("tg_a"))), Seq("doc_a"))
      .join(broadcast(tg.select(col("doc_id").as("doc_b"),
        col("tgh").as("tg_b"))), Seq("doc_b"))
      .withColumn("inter",
        expr("graft_sorted_intersect(tg_a, tg_b)").cast("bigint"))
      .withColumn("uni",
        (size(col("tg_a")) + size(col("tg_b"))).cast("bigint") - col("inter"))
      .withColumn("jaccard", Num.guardedRatio(col("inter"), col("uni"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Connected components by min-label propagation with pointer jumping:
    * every vertex starts as its own label; each round pushes the smaller
    * label across every edge, then compresses paths by following each
    * label to ITS label (labels are always ≤ their owner, so the jump is
    * monotone). Edge propagation alone needs diameter rounds; the jump
    * halves chain lengths every round, so convergence is O(log diameter).
    * Labels only decrease and their sum is a strictly decreasing
    * convergence measure, so the loop needs one aggregate action per round
    * and `localCheckpoint` keeps the plan from growing with the iteration
    * count.
    *
    * Returns (doc_id, canonical_id = component-minimum doc_id). */
  def components(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val both = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(
        edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = vertices.select(col("doc_id"), col("doc_id").as("lbl"))
      .localCheckpoint()
    var lastSum = labels.agg(sum(col("lbl"))).head().getLong(0)
    var converged = false
    while (!converged) {
      // The label map is one row per vertex (narrow) while the edge list
      // dominates the round — broadcast the labels so the edge side never
      // re-shuffles. Checkpointed frames have no size stats, so the hint
      // stands in for the AQE decision; Spark degrades to a shuffle join
      // when the map outgrows the broadcast limit.
      val prop = both.join(broadcast(labels),
          both("src") === labels("doc_id"))
        .select(col("dst").as("doc_id"), col("lbl"))
      val merged = labels.unionByName(prop)
        .groupBy(col("doc_id")).agg(min(col("lbl")).as("lbl"))
      // pointer jump (twice): label(v) := label(label(v)) — each jump is
      // a broadcast self-join of the narrow label map and quarters the
      // remaining chain length per round
      val next = jump(jump(merged)).localCheckpoint()
      val s = next.agg(sum(col("lbl"))).head().getLong(0)
      converged = s == lastSum
      lastSum = s
      labels = next
    }
    labels.select(col("doc_id"), col("lbl").as("canonical_id"))
  }

  private def jump(labels: DataFrame): DataFrame =
    labels.join(
        broadcast(labels.select(col("doc_id").as("p"),
          col("lbl").as("plbl"))),
        col("lbl") === col("p"))
      .select(col("doc_id"), col("plbl").as("lbl"))

  /** The registered query: near-duplicate cluster assignment over the
    * documents table. Every doc appears exactly once; singletons map to
    * themselves. Oracle: DuckDB recursive-CTE components over the exact
    * all-pairs trigram-Jaccard graph (OpsOracles.minhashClusters) — the
    * LSH path must reproduce the exact graph's components, which DedupSpec
    * and the harness verify cell-for-cell. */
  def clusters(spark: SparkSession, dir: String,
               threshold: Double = 0.6): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = signatures(docs).cache()
    val edges = confirmedEdges(sigs, candidateEdges(sigs), threshold)
    components(sigs.select("doc_id"), edges)
  }

  /** Pair-level view (doc_a, doc_b, jaccard) — kept for diagnostics and
    * recall tests; the registered contract is [[clusters]]. */
  def nearDuplicates(spark: SparkSession, dir: String,
                     threshold: Double = 0.6): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = signatures(docs).cache()
    confirmedEdges(sigs, candidateEdges(sigs), threshold)
  }
}
