package graft.text

import graft.functions.SignatureExpressions
import graft.util.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 64-bit token-level fingerprints whose
  * Hamming distance approximates content similarity.
  *
  * Signature: for each bit i, sum +1/−1 over token hashes' bit i; bit set if
  * the sum is positive. Candidate generation splits the 64-bit signature
  * into four 16-bit chunks — two documents within Hamming distance 3 must
  * share at least one chunk (pigeonhole), so the bucket self-join on
  * (chunk_idx, chunk) finds all such pairs without an N² scan. Pure
  * expression pipeline (no UDFs), deterministic.
  */
object SimHashDedup {

  /** doc_id + 64-bit simhash of whitespace tokens, via the native
    * SimHashSignature expression (graft.functions). */
  def signatures(docs: DataFrame): DataFrame = {
    SignatureExpressions.register(docs.sparkSession, 64,
      Array(1L), Array(0L), 2147483647L)
    Layout.spread(docs)
      .withColumn("norm", lower(regexp_replace(col("text"), "\\s+", " ")))
      .withColumn("toks", expr(
        "CASE WHEN trim(norm) = '' THEN array() " +
          "ELSE split(trim(norm), ' ') END"))
      .withColumn("th", expr("transform(toks, t -> xxhash64(t))"))
      .withColumn("simhash", expr("graft_simhash(th)"))
      .select("doc_id", "simhash")
  }

  /** Pairs within `maxHamming` (≤ 3 guaranteed complete via 4×16-bit
    * chunk blocking). */
  def nearDuplicates(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = signatures(docs)
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), j -> (simhash >> (j * 16)) & 65535)"))
        .as(Seq("chunk_idx", "chunk")))
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
