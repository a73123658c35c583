package graft.text

import graft.util.Num
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  private def lit64(xs: Seq[Long]): Column =
    array(xs.map(x => lit(x)): _*)

  /** doc_id + minhash signature (array<bigint> of length 64). */
  def signatures(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm", lower(regexp_replace(col("text"), "\\s+", " ")))
      .withColumn("tg", expr(
        "CASE WHEN length(norm) >= 3 THEN " +
          "array_distinct(transform(sequence(1, length(norm) - 2), " +
          "i -> substring(norm, i, 3))) ELSE array() END"))
      .withColumn("tgh",
        expr("transform(tg, t -> pmod(xxhash64(t), 2147483647L))"))
      .withColumn("perm_a", lit64(permA))
      .withColumn("perm_b", lit64(permB))
      .withColumn("minhash", expr(
        s"""transform(sequence(0, ${NumPerms - 1}), i ->
           |  CASE WHEN size(tgh) = 0 THEN ${Prime}L ELSE
           |    array_min(transform(tgh, h ->
           |      pmod(element_at(perm_a, i + 1) * h +
           |           element_at(perm_b, i + 1), ${Prime}L)))
           |  END)""".stripMargin))
      .select(col("doc_id"), col("tg"), col("minhash"))

  /** LSH candidate pairs: same signature in any band. */
  def candidatePairs(sigs: DataFrame): DataFrame = {
    val banded = sigs
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), b -> " +
          s"concat_ws(',', slice(minhash, b * $RowsPerBand + 1, " +
          s"$RowsPerBand)))")).as(Seq("band_idx", "band_key")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Candidates confirmed by exact trigram Jaccard >= threshold. */
  def nearDuplicates(spark: SparkSession, dir: String,
                     threshold: Double = 0.6): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = signatures(docs).cache()
    val pairs = candidatePairs(sigs)
    val tgA = sigs.select(col("doc_id").as("doc_a"), col("tg").as("tg_a"))
    val tgB = sigs.select(col("doc_id").as("doc_b"), col("tg").as("tg_b"))
    pairs
      .join(tgA, Seq("doc_a"))
      .join(tgB, Seq("doc_b"))
      .withColumn("inter",
        size(array_intersect(col("tg_a"), col("tg_b"))).cast("bigint"))
      .withColumn("uni",
        size(array_union(col("tg_a"), col("tg_b"))).cast("bigint"))
      .withColumn("jaccard", Num.guardedRatio(col("inter"), col("uni"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
