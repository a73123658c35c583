package graft.text

import graft.functions.SignatureExpressions
import graft.util.{Layout, Num}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection — the scale path for fuzzy dedup
  * (blocked trigram Jaccard in [[TextOps.ngramJaccard]] is the exact
  * baseline it is verified against in MinHashSpec).
  *
  * Pipeline: character trigrams → 64 permutation min-hashes → 16 bands of 4
  * → bucket self-join on (band, signature) → candidate pairs → exact Jaccard
  * confirm. At 100 TB only the bucket join shuffles, keyed by band
  * signature, and candidate pairs are a vanishing fraction of the N² space;
  * the confirm step touches only candidates.
  *
  * All hash parameters are fixed constants (LCG-derived), so results are
  * deterministic across runs and partitionings. No UDFs: signatures are
  * nested higher-order expressions (transform/aggregate), fully codegen'd.
  */
object MinHashDedup {

  val NumPerms = 64
  val Bands = 16
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

  /** Buckets larger than this are skipped (frequent-band skip): a bucket
    * holding a large fraction of the corpus carries no discriminative
    * signal and would contribute O(bucket²) candidate pairs. Pairs that are
    * genuine near-duplicates agree on many bands and are still found via
    * their selective ones. */
  val MaxBucketSize = 64

  /** LSH candidate pairs: same signature in any not-oversized band. */
  def candidatePairs(sigs: DataFrame,
                     maxBucketSize: Int = MaxBucketSize): DataFrame = {
    // Band key = hash of the band's minhash slice (long join key, not a
    // concatenated string; false bucket collisions are filtered by the
    // estimate/confirm stages anyway).
    val banded = sigs
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), b -> " +
          s"xxhash64(slice(minhash, b * $RowsPerBand + 1, $RowsPerBand)))"))
        .as(Seq("band_idx", "band_key")))
    val bucketSizes = banded.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
    val pruned = banded.join(bucketSizes, Seq("band_idx", "band_key"))
    val a = pruned.as("a")
    val b = pruned.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Candidates confirmed by exact trigram Jaccard >= threshold.
    *
    * Two-stage confirm: candidates are first scored by signature agreement
    * (fraction of equal minhash components — an unbiased Jaccard
    * estimator, 64 long comparisons) and only pairs within a safety margin
    * of the threshold pay for the exact trigram-set Jaccard. On a corpus
    * with many mid-similarity pairs this cuts the expensive set-op stage
    * by an order of magnitude. */
  def nearDuplicates(spark: SparkSession, dir: String,
                     threshold: Double = 0.6): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = signatures(docs).cache()
    // Cached: the band self-join subtree otherwise re-materializes inside
    // the estimate+confirm joins' stages.
    val pairs = candidatePairs(sigs).cache()
    val mhA = sigs.select(col("doc_id").as("doc_a"),
      col("minhash").as("mh_a"))
    val mhB = sigs.select(col("doc_id").as("doc_b"),
      col("minhash").as("mh_b"))
    val minAgree = math.max(0,
      math.ceil((threshold - 0.15) * NumPerms).toInt)
    val estimated = pairs
      .join(mhA, Seq("doc_a"))
      .join(mhB, Seq("doc_b"))
      .filter(expr("graft_sig_agreement(mh_a, mh_b)") >= minAgree)
      .select("doc_a", "doc_b")
    // Exact confirm on SORTED hashed trigram sets: two-pointer merge
    // intersection (native expression — no per-pair hash set), union by
    // inclusion-exclusion. xxhash64 collisions are negligible here.
    val tgA = sigs.select(col("doc_id").as("doc_a"), col("tgh").as("tg_a"))
    val tgB = sigs.select(col("doc_id").as("doc_b"), col("tgh").as("tg_b"))
    estimated
      .join(tgA, Seq("doc_a"))
      .join(tgB, Seq("doc_b"))
      .withColumn("inter",
        expr("graft_sorted_intersect(tg_a, tg_b)").cast("bigint"))
      .withColumn("uni",
        (size(col("tg_a")) + size(col("tg_b"))).cast("bigint") - col("inter"))
      .withColumn("jaccard", Num.guardedRatio(col("inter"), col("uni"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
