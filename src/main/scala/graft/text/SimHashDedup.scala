package graft.text

import graft.functions.SignatureExpressions
import graft.util.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 60-bit token-level fingerprints whose
  * Hamming distance approximates content similarity.
  *
  * Signature: token hashes are the first 15 hex digits of md5 (60 bits —
  * md5 so the DuckDB oracle can recompute the identical values; 15 digits
  * so the value fits a signed BIGINT in both engines); for each bit i,
  * sum +1/−1 over the hashes' bit i; bit set iff the sum is positive.
  * Candidate generation splits the signature into eight 8-bit chunks —
  * two documents within Hamming distance 7 must share at least one chunk
  * (pigeonhole), so the bucket self-join on (chunk_idx, chunk) finds ALL
  * such pairs without an N² scan, which is exactly what the all-pairs
  * DuckDB oracle (OpsOracles.simhashPairs) checks cell-for-cell. Pure
  * expression pipeline (no UDFs), deterministic.
  */
object SimHashDedup {

  /** Blocking is complete (pigeonhole over 8 chunks) only up to this
    * Hamming distance. */
  val MaxCompleteHamming = 7

  /** doc_id + simhash of whitespace tokens (md5-derived hashes folded by
    * the native SimHashSignature expression; duplicates count). */
  def signatures(docs: DataFrame): DataFrame = {
    SignatureExpressions.register(docs.sparkSession, 64,
      Array(1L), Array(0L), 2147483647L)
    Layout.spread(docs)
      .withColumn("norm", lower(regexp_replace(col("text"), (TextOps.Ws + "+"), " ")))
      .withColumn("toks", expr(
        "CASE WHEN trim(norm) = '' THEN array() " +
          "ELSE split(trim(norm), ' ') END"))
      .withColumn("th", expr(
        "transform(toks, t -> " +
          "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"))
      .withColumn("simhash", expr("graft_simhash(th)"))
      .select("doc_id", "simhash")
  }

  /** All pairs within `maxHamming` (must be <= [[MaxCompleteHamming]] so
    * the 8×8-bit chunk blocking is provably complete). */
  def nearDuplicates(docs: DataFrame,
                     maxHamming: Int = MaxCompleteHamming): DataFrame = {
    require(maxHamming <= MaxCompleteHamming,
      s"chunk blocking is complete only up to $MaxCompleteHamming")
    val sigs = signatures(docs)
    // posexplode_outer: plain posexplode triggers InferFiltersFromGenerate,
    // whose size/isnotnull filter re-derives the simhash + chunk transform
    // twice more per doc after pushdown (the array is never empty — the
    // outer form emits identical rows, minus the synthesized filter).
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      posexplode_outer(expr(
        "transform(sequence(0, 7), j -> (simhash >> (j * 8)) & 255)"))
        .as(Seq("chunk_idx", "chunk")))
      .filter(col("chunk_idx").isNotNull) // pos-null = empty array only
    val a = chunked.as("a")
    val b = chunked.as("b")
    a.join(b,
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming",
        expr("cast(bit_count(sh_a ^ sh_b) as int)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
