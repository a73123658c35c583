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
    packAssign(
      d.withColumn("shard", expr(TextOps.md5BucketExpr(shards.toLong)))
        .withColumn("n_tokens",
          expr(TextOps.tokenCountExpr).cast("bigint")),
      orderCols = Seq("doc_id"), budget = budget)
      .select("doc_id", "shard", "n_tokens", "seq_id", "seq_offset")
  }

  /** The packing window itself, over any frame carrying (`shard`,
    * `n_tokens`, a deterministic order): per-shard cumulative token
    * start → (seq_id, seq_offset). Shared by [[packSequences]] (docs)
    * and [[packChunks]] (context windows), so both compositions pack
    * under one contract. Adds `seq_id`/`seq_offset`; keeps every input
    * column. */
  private def packAssign(in: DataFrame, orderCols: Seq[String],
                         budget: Long): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(orderCols.map(col).toIndexedSeq: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    in.withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", expr(
        s"cast(shard as bigint) * ${1L << 48}L + (cum_before div $budget)"))
      .withColumn("seq_offset", col("cum_before") % budget)
  }

  /** Per-sequence manifest — the artifact a tokenizer actually consumes
    * (the doc→seq assignment alone is only half the op): one row per
    * training sequence with membership count, token accounting, fill
    * ratio, and the ordered doc span list.
    *
    * Accounting contract (docs assigned to a seq occupy contiguous
    * offsets `[min(seq_offset), max(seq_offset + n_tokens))`; a doc
    * overflowing the budget boundary spills its tail into the NEXT
    * window, where it shows up as that window's non-zero starting
    * offset):
    *   - `total_tokens`  = Σ n_tokens of assigned docs (can exceed the
    *     budget when the last doc overflows);
    *   - `overflow_tokens` = tokens of the last assigned doc past this
    *     window's budget boundary (the tokenizer either truncates them
    *     or consumes them as the next window's head — either way this
    *     column is the truncation account);
    *   - `fill_ratio` = fraction of the budget window covered by tokens
    *     (assigned docs + inflow from the previous window's overflow);
    *     exactly 1.0 for every window except each shard's last, by
    *     construction;
    *   - `doc_spans` = "doc@offset+len" CSV ordered by (offset, doc),
    *     a string so the oracle compares it exactly without nested-type
    *     hashing hazards.
    *
    * Scale shape: the packSequences window plus ONE hash aggregation on
    * seq_id. Per-seq state is budget-bounded (≤ budget non-empty docs
    * per sequence; empty docs are zero-width spans and upstream corpus
    * cleaning drops them), so the collect_list buffer can never go
    * corpus-scale. */
  def packManifest(s: SparkSession, dir: String, budget: Long = 2048L,
                   shards: Int = 8): DataFrame = {
    // struct leads with (seq_offset, doc_id) so sort_array orders spans
    // by offset with doc_id tie-break (ties = zero-width empty docs) —
    // deterministic on both engines.
    val spans = sort_array(collect_list(struct(
      col("seq_offset"), col("doc_id"), col("n_tokens"))))
    val endOff = max(col("seq_offset") + col("n_tokens"))
    packSequences(s, dir, budget, shards)
      .groupBy(col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        greatest(endOff - lit(budget), lit(0L)).as("overflow_tokens"),
        (least(endOff, lit(budget)).cast("double") / lit(budget.toDouble))
          .as("fill_ratio"),
        array_join(transform(spans, x => concat(
          x.getField("doc_id").cast("string"), lit("@"),
          x.getField("seq_offset").cast("string"), lit("+"),
          x.getField("n_tokens").cast("string"))), ",").as("doc_spans"))
      .withColumn("shard",
        expr(s"cast(seq_id div ${1L << 48}L as int)"))
      .select("seq_id", "shard", "n_docs", "total_tokens",
        "overflow_tokens", "fill_ratio", "doc_spans")
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
                     overlap: Int = 64): DataFrame =
    chunksRaw(s, dir, chunk, overlap)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        length(col("chunk_text")).as("chunk_len"),
        md5(col("chunk_text")).as("chunk_md5"))

  /** Chunk bodies still in hand (doc_id, chunk_idx, chunk_start,
    * chunk_text) — [[chunkDocuments]] digests them, [[packChunks]]
    * tokenizes them. */
  private def chunksRaw(s: SparkSession, dir: String, chunk: Int,
                        overlap: Int): DataFrame = {
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
  }

  /** chunk → pack composition: split long documents into context
    * windows ([[chunkDocuments]] geometry), then pack the CHUNKS into
    * fixed-token-budget training sequences under the same
    * [[packAssign]] contract — the standard long-doc training-data
    * shape (a 100k-token doc never monopolizes a window; its chunks
    * pack densely alongside other docs' chunks).
    *
    * Chunks shard by their parent doc's md5 bucket (all of a doc's
    * chunks land in one shard, so a shard's window replays its docs
    * contiguously) and order by (doc_id, chunk_idx) within the shard.
    * Chunk bodies tokenize with the corpus-wide
    * [[TextOps.tokenCountExprOn]] definition.
    *
    * Scale shape: the chunk generator's narrow projection + the
    * per-shard packing window — one shuffle (by shard), no joins. */
  def packChunks(s: SparkSession, dir: String, budget: Long = 2048L,
                 shards: Int = 8, chunk: Int = 512,
                 overlap: Int = 64): DataFrame =
    packAssign(
      chunksRaw(s, dir, chunk, overlap)
        .withColumn("shard", expr(TextOps.md5BucketExpr(shards.toLong)))
        .withColumn("n_tokens",
          expr(TextOps.tokenCountExprOn("chunk_text")).cast("bigint")),
      orderCols = Seq("doc_id", "chunk_idx"), budget = budget)
      .select("doc_id", "chunk_idx", "shard", "n_tokens", "seq_id",
        "seq_offset")
}
