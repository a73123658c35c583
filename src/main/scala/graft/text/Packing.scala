package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence assembly for LLM training — the step between a curated
  * corpus and a token stream: pack documents into fixed-token-budget
  * training sequences, and chunk long documents into overlapping
  * context windows. Both are deterministic, integer-exact, and
  * shard-parallel (no partition-less window anywhere), so the DuckDB
  * oracles replay them cell-for-cell.
  */
object Packing {

  /** Assign every document to a training sequence under a token budget.
    *
    * Deterministic greedy-by-start contract: shard docs by the
    * content-independent md5 bucket (the [[TextOps.hashSplit]] scheme —
    * reproducible on any engine, stable under repartitioning), order
    * each shard by doc_id, and place a doc in the sequence its
    * CUMULATIVE token start falls in: seq = cum_before div budget
    * (integral division — matches the oracle's `//` at every
    * magnitude). A doc longer than the budget owns its start sequence
    * (packing never splits a doc — chunking, [[chunkDocuments]], is the
    * op that splits). seq_id = shard·2⁴⁸ + seq: a shard would need
    * budget·2⁴⁸ cumulative tokens (≫ any corpus) to overflow into the
    * next shard's id space, so ids are unique across shards even at
    * petabyte token counts.
    *
    * Scale shape: one narrow projection (token count), one window per
    * SHARD (bounded partitions — shard count is the parallelism knob,
    * never a global window), zero joins. Token count and shard bucket
    * are the SHARED [[TextOps.tokenCountExpr]] /
    * [[TextOps.md5BucketExpr]] definitions, so this operator, textStats
    * and hashSplit can never silently desynchronize from their
    * oracles. */
  def packSequences(s: SparkSession, dir: String, budget: Long = 2048L,
                    shards: Int = 8): DataFrame = {
    val d = graft.util.Layout.spread(
      s.read.parquet(s"$dir/documents.parquet"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("shard", expr(TextOps.md5BucketExpr(shards.toLong)))
      .withColumn("n_tokens",
        expr(TextOps.tokenCountExpr).cast("bigint"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", expr(
        s"cast(shard as bigint) * ${1L << 48}L + (cum_before div $budget)"))
      .withColumn("seq_offset", col("cum_before") % budget)
      .select("doc_id", "shard", "n_tokens", "seq_id", "seq_offset")
  }

  /** Split documents into fixed-size overlapping context windows:
    * chunk starts at 1, 1+stride, 1+2·stride, … (stride =
    * chunk − overlap), each `chunk` chars long (the final one may be
    * shorter; empty docs yield no chunks). Starts stop at
    * len − overlap: a later start's window would sit wholly inside the
    * previous chunk (which already reached the end of the doc), so the
    * bound suppresses fully-redundant trailing windows while keeping
    * every character covered (the last kept start is > len − chunk).
    * Chunks travel as md5 digests + lengths, not text — downstream
    * dedup/indexing consumes the digest, and the oracle compares
    * exactly without shipping bodies.
    *
    * Scale shape: pure narrow projection + generator — no shuffle, no
    * join at any corpus size (PlanSpec asserts it). posexplode_outer +
    * position-null filter dodges the InferFiltersFromGenerate
    * re-derivation tax on the starts array. */
  def chunkDocuments(s: SparkSession, dir: String, chunk: Int = 512,
                     overlap: Int = 64): DataFrame = {
    require(overlap >= 0 && overlap < chunk,
      s"overlap $overlap must be in [0, chunk $chunk)")
    val stride = chunk - overlap
    graft.util.Layout.spread(s.read.parquet(s"$dir/documents.parquet"))
      .withColumn("starts", expr(
        "CASE WHEN length(text) >= 1 THEN " +
          s"sequence(1, greatest(length(text) - $overlap, 1), $stride) " +
          "ELSE array() END")) // sequence(1, 0) would DESCEND, not empty
      .select(col("doc_id"), col("text"),
        posexplode_outer(col("starts")).as(Seq("chunk_idx", "chunk_start")))
      .filter(col("chunk_idx").isNotNull) // outer-null = empty doc only
      .withColumn("chunk_text",
        expr(s"substring(text, chunk_start, $chunk)"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        length(col("chunk_text")).as("chunk_len"),
        md5(col("chunk_text")).as("chunk_md5"))
  }
}
