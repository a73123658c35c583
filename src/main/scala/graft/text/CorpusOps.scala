package graft.text

import graft.util.Num
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale pre-training pipeline runs
  * after the per-document stats in [[TextOps]]: repetition-based quality
  * signals (the Gopher-style gates), benchmark decontamination by n-gram
  * overlap, data-derived source rebalancing, PII masking, and the composite
  * keep-set pipeline that chains them.
  *
  * Everything is built from codegen'd builtins; the only shuffles are
  * hash-aggregates keyed by doc_id / (doc_id, token) — linear in corpus
  * size and partition-parallel, never pairwise. Each operator has a pure
  * `DataFrame => DataFrame` form for tests and a `(SparkSession, dir)`
  * entry for the registered query.
  */
object CorpusOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.util.Layout.spread(s.read.parquet(s"$dir/documents.parquet"))

  /** Lowered whitespace tokens; empty-string tokens dropped so a trailing
    * space never mints a token (DuckDB's string_split_regex agrees once
    * both sides filter empties). The whitespace class is spelled out
    * (the TextOps.regexTokens rule): Java's \s includes \x0B, RE2's does
    * not, and the oracle must tokenize a vertical-tab corpus
    * identically. */
  private val toksExpr =
    s"filter(split(lower(trim(text)), '${TextOps.WsSql}+'), " +
      "t -> t <> '')"

  // ---------------------------------------------------------------- //
  // Repetition signals (Gopher-style quality gates)                  //
  // ---------------------------------------------------------------- //

  /** Per-document repetition signals: duplicate-word fraction, most-
    * frequent-token fraction, most-frequent-bigram fraction, and the
    * composite `is_repetitive` gate — the content-level dual of the
    * shape-level gates in [[TextOps.qualityFilter]].
    *
    * Plan shape: one narrow explode per n-gram order, a hash-aggregate
    * keyed (doc_id, gram) — partial+final, so the map side already
    * collapses in-doc repeats — then a doc_id re-aggregate. Both shuffle
    * keys are unskewed (bounded by doc length) and linear in corpus
    * size; the final joins are all doc_id-keyed and co-partitioned.
    * Nothing is pairwise, so the plan survives a 100× scale-up as-is. */
  def repetitionStats(d: DataFrame): DataFrame = {
    val base = d
      .withColumn("toks", expr(toksExpr))
      .select(col("doc_id"), col("lang"), col("source"), col("toks"),
        // sequence(1, 0) is DESCENDING in Spark, so the n<2 case must be
        // handled explicitly, not via greatest().
        expr("CASE WHEN size(toks) >= 2 THEN " +
          "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))" +
          " ELSE array() END").as("bigrams"))
    // explode_outer + post-generate null filter, NOT plain explode: on
    // explode() the InferFiltersFromGenerate rule synthesizes
    // `size(arr) > 0 AND isnotnull(arr)` below the Generate, and after
    // pushdown that filter carries the array-builder expression fully
    // inlined — for the bigram lambda every element_at() re-evaluates the
    // whole tokenization subtree, turning one tokenization per doc into
    // ~4·|bigrams| (measured 25× slower at sf0.1). explode_outer infers
    // nothing; the null row an empty array emits dies in the cheap
    // attribute filter.
    val uni = base
      .select(col("doc_id"), explode_outer(col("toks")).as("t"))
      .filter(col("t").isNotNull)
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_token_n"))
    val bi = base
      .select(col("doc_id"), explode_outer(col("bigrams")).as("b"))
      .filter(col("b").isNotNull)
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bigram_n"))
    def z(c: String): Column = coalesce(col(c), lit(0L)).as(c)
    base.select("doc_id", "lang", "source")
      .join(uni, Seq("doc_id"), "left")
      .join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"),
        z("n_tokens"), z("n_distinct"), z("top_token_n"),
        z("n_bigrams"), z("top_bigram_n"))
      .withColumn("dup_word_ratio",
        Num.guardedRatio(col("n_tokens") - col("n_distinct"),
          col("n_tokens"), 4))
      .withColumn("top_token_ratio",
        Num.guardedRatio(col("top_token_n"), col("n_tokens"), 4))
      .withColumn("top_bigram_ratio",
        Num.guardedRatio(col("top_bigram_n"), col("n_bigrams"), 4))
      .withColumn("is_repetitive",
        when(col("dup_word_ratio") >= 0.8 ||
          col("top_token_ratio") >= 0.3 ||
          col("top_bigram_ratio") >= 0.18, 1).otherwise(0).cast("int"))
  }

  def repetitionStats(s: SparkSession, dir: String): DataFrame =
    repetitionStats(docs(s, dir))

  // ---------------------------------------------------------------- //
  // Benchmark decontamination                                        //
  // ---------------------------------------------------------------- //

  /** Distinct word-5-gram xxhash64 signatures per document. Grams travel
    * as 8-byte hashes, not strings (the [[TextOps.ngramJaccard]] trick):
    * overlap COUNTS are what downstream compares, and those match the
    * string-set counts unless two distinct grams of one corpus collide
    * (~1e-11 here; the oracle uses the string form and agrees). */
  private[graft] def gramSigs(d: DataFrame, n: Int): DataFrame =
    d.withColumn("toks", expr(toksExpr))
      // sequence(1, 0) is DESCENDING, so guard the short-doc case with an
      // explicit CASE rather than greatest().
      .withColumn("grams", expr(
        s"CASE WHEN size(toks) >= $n THEN " +
          s"array_distinct(transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> xxhash64(concat_ws(' ', slice(toks, i, $n))))) " +
          s"ELSE array() END"))
      .select(col("doc_id"), col("lang"), col("source"),
        size(col("grams")).as("n_grams"), col("grams"))

  /** Test-set decontamination: flag every training document sharing at
    * least one word-5-gram with the benchmark partition (`benchSource`) —
    * the standard eval-leakage sweep a pre-training pipeline runs before
    * the corpus ships.
    *
    * Plan shape: benchmark grams deduplicate to one small distinct set;
    * the training side explodes to (doc_id, gram) and equi-joins on the
    * gram hash. No broadcast hint on purpose — a real benchmark suite is
    * MBs (AQE turns the join into a broadcast on its own), but nothing
    * in the contract caps it, and the shuffle join stays correct and
    * linear when it outgrows the threshold. The gram explode is the only
    * fan-out and is bounded by corpus token count. */
  def decontaminate(train: DataFrame, bench: DataFrame,
                    n: Int = 5): DataFrame = {
    // explode_outer + null filter for the same InferFiltersFromGenerate
    // reason as repetitionStats: the inferred size/isnotnull filter would
    // re-tokenize per slice() call inside the gram lambda.
    val benchGrams = gramSigs(bench, n)
      .select(explode_outer(col("grams")).as("gh"))
      .filter(col("gh").isNotNull).distinct()
    val t = gramSigs(train, n)
    val hits = t.select(col("doc_id"), explode_outer(col("grams")).as("gh"))
      .filter(col("gh").isNotNull)
      .join(benchGrams, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))
    t.select("doc_id", "lang", "source", "n_grams")
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_contaminated",
        coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("is_contaminated",
        when(col("n_contaminated") > 0, 1).otherwise(0).cast("int"))
  }

  /** Registered form: `src0` is the held-out benchmark partition; every
    * other source is training data swept against it. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    decontaminate(d.filter(col("source") =!= "src0"),
      d.filter(col("source") === "src0"))
  }

  /** Bloom-pruned decontamination — IDENTICAL output to
    * [[decontaminate]] (it shares the oracle), different 100 TB shape:
    * the benchmark's distinct gram set builds a Bloom filter ONCE
    * (driver/broadcast state ~1.2 MB per million grams at 1% fpp —
    * benchmark suites are metadata-scale, the bounded-collect
    * discipline), and every training document's gram array is pruned
    * through it MAP-SIDE (`graft_bloom_keep`, a per-doc tight-loop
    * native expression) BEFORE the explode. The baseline plan explodes
    * every training gram into the shuffle; here only grams that might
    * match the benchmark survive — at real-corpus contamination rates
    * that prunes ~99% of the dominant shuffle. The filter's error is
    * one-sided (definitely-absent grams drop; false positives ride
    * through to the SAME exact equi-join), so the output is exact, not
    * probabilistic — DecontaminateBloomSpec pins frame equality with
    * the baseline and the oracle is shared verbatim. */
  def decontaminateBloom(train: DataFrame, bench: DataFrame,
                         n: Int = 5): DataFrame = {
    val spark = train.sparkSession
    val benchGrams = gramSigs(bench, n)
      .select(explode_outer(col("grams")).as("gh"))
      .filter(col("gh").isNotNull).distinct().persist()
    val nBench = math.max(benchGrams.count(), 1L)
    val bf = benchGrams.stat.bloomFilter("gh", nBench, 0.01)
    graft.functions.BloomKeep.register(spark, bf)
    val t = gramSigs(train, n)
    val hits = t
      .select(col("doc_id"), expr("graft_bloom_keep(grams)").as("bg"))
      .select(col("doc_id"), explode_outer(col("bg")).as("gh"))
      .filter(col("gh").isNotNull)
      .join(benchGrams, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))
    t.select("doc_id", "lang", "source", "n_grams")
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_contaminated",
        coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("is_contaminated",
        when(col("n_contaminated") > 0, 1).otherwise(0).cast("int"))
  }

  /** Registered bloom form — same split as [[decontaminate]]'s. */
  def decontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    decontaminateBloom(d.filter(col("source") =!= "src0"),
      d.filter(col("source") === "src0"))
  }

  // ---------------------------------------------------------------- //
  // Heavy-hitter tokens (SpaceSaving contract)                       //
  // ---------------------------------------------------------------- //

  /** Guaranteed-heavy corpus tokens with the SpaceSaving contract —
    * frequent-items completes the sketch family next to HLL
    * (approx-distinct), GK (percentiles) and Count-Min (point counts),
    * on the one column of this corpus with real Zipf skew.
    *
    * The agg_approx_distinct pattern: the output rows are the EXACT
    * heavy hitters (true frequency strictly > n/k, computed by plain
    * count — the integer form `cnt·k > n` avoids a division), and the
    * sketch contributes contract BOOLEANS the SpaceSaving guarantees
    * force TRUE under any merge order: the item is in the k-entry
    * summary, its estimate over-counts, and the over-count is within
    * its tracked err ≤ n/k. The raw estimates are deliberately NOT
    * emitted — the kept-set tail and the counts themselves are
    * merge-order dependent; the guarantees are not.
    *
    * Scale shape: the sketch side is one fixed-width (≤ k entries)
    * partial per partition merged to a single ~64-entry row — the whole
    * point of the sketch at 100 TB. The exact side pays the token
    * shuffle because the CONTRACT needs ground truth next to it, by
    * design. */
  /** Heavy-hitter threshold k shared by [[heavyTokens]] and its oracle
    * (OpsOracles.heavyTokens interpolates this constant — the
    * PageRank.Iterations convention — so changing it can't silently
    * desynchronize engine and oracle). */
  val HeavyK: Int = 64

  def heavyTokens(s: SparkSession, dir: String,
                  k: Int = HeavyK): DataFrame = {
    graft.functions.SpaceSaving.register(s)
    val toks = docs(s, dir)
      .withColumn("toks", expr(toksExpr))
      .select(explode_outer(col("toks")).as("token"))
      .filter(col("token").isNotNull)
      .persist()
    val exact = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("n_exact"))
      .persist()
    val n = exact.agg(coalesce(sum(col("n_exact")), lit(0L)))
      .head().getLong(0)
    val sk = toks.agg(expr(s"graft_spacesaving(token, $k)").as("sk"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    import s.implicits._
    val skDf = sk.toSeq.map { case (t, (est, err)) => (t, est, err) }
      .toDF("token", "ss_est", "ss_err")
    exact.filter(col("n_exact") * k > n)
      .join(broadcast(skDf), Seq("token"), "left")
      .select(col("token"), col("n_exact"),
        col("ss_est").isNotNull.as("in_sketch"),
        (col("ss_est") >= col("n_exact")).as("est_ge_true"),
        (col("ss_est") - col("n_exact") <= col("ss_err") &&
          col("ss_err") * k <= lit(n)).as("err_within_bound"))
  }

  // ---------------------------------------------------------------- //
  // Hashed linear classifier scoring                                 //
  // ---------------------------------------------------------------- //

  /** Model-based quality scoring plumbing — the fasttext-classifier
    * stage of a modern curation pipeline (DCLM / FineWeb-Edu style),
    * with the trained weights STUBBED deterministically (the multimodal
    * codec-stub philosophy: the Spark-side shape — feature hashing,
    * per-token weight lookup, per-doc logit aggregation, threshold
    * gate — is real and verified; swapping in learned weights changes
    * one expression). Each token hashes to a weight
    * w(tok) = int(first two md5 hex digits of "qw_<tok>") − 128 ∈
    * [−128, 127]; the doc's logit_sum is Σ_instances w, mean_logit its
    * per-token mean, keep = mean_logit > 0. md5 is engine-identical, so
    * the DuckDB oracle replays weights and logits exactly.
    *
    * Plan shape: one token explode (linear in corpus tokens) with the
    * weight computed INLINE in the projection — no weight-table join;
    * a real model would broadcast its vocab-sized weight table — then a
    * single doc-keyed hash aggregate. */
  def classifierScore(d: DataFrame): DataFrame = {
    val w = "cast(conv(substring(md5(concat('qw_', tok)), 1, 2), 16, 10)" +
      " as bigint) - 128"
    d.withColumn("toks", expr(toksExpr))
      // explode_outer + null filter: the InferFiltersFromGenerate guard
      .select(col("doc_id"), col("lang"), col("source"),
        explode_outer(col("toks")).as("tok"))
      .withColumn("valid", col("tok").isNotNull)
      .withColumn("w", when(col("valid"), expr(w)).otherwise(0L))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(
        sum(when(col("valid"), 1L).otherwise(0L)).as("n_tokens"),
        sum(col("w")).as("logit_sum"))
      .withColumn("mean_logit",
        Num.guardedRatio(col("logit_sum"), col("n_tokens"), 4))
      .withColumn("keep",
        when(col("mean_logit") > 0.0, 1).otherwise(0).cast("int"))
  }

  def classifierScore(s: SparkSession, dir: String): DataFrame =
    classifierScore(docs(s, dir))

  // ---------------------------------------------------------------- //
  // Cross-document duplicated spans                                  //
  // ---------------------------------------------------------------- //

  /** Cross-document duplicated-span statistics — the exact-substring
    * dedup lens (Lee et al. 2021, "Deduplicating Training Data Makes
    * Language Models Better": repeated spans, not just whole near-dup
    * documents, are what a span cutter removes). A word-[[DupSpanW]]-gram
    * occurring in ≥ 2 DISTINCT documents is a duplicated span; each doc
    * reports its sliding-window count, how many of those windows sit on a
    * duplicated gram (in-doc repeats of a shared gram all count — the
    * cutter removes every occurrence), the distinct duplicated grams, and
    * the duplicated fraction. Docs shorter than W report zero windows.
    *
    * Plan shape — the [[repetitionStats]] scale argument: one narrow
    * gram explode (linear in corpus tokens), a (gh, doc_id)-keyed hash
    * aggregate whose map side collapses in-doc repeats, a gh-keyed doc-
    * frequency aggregate over the ALREADY per-doc-collapsed rows (state
    * per gram is one counter — never a collected list), and doc_id-keyed
    * re-aggregate + left join back to the per-doc frame. Grams travel as
    * 8-byte xxhash64 signatures (the [[gramSigs]] trick; the oracle uses
    * the string form and agrees unless two distinct corpus grams collide,
    * ~1e-11). Nothing is pairwise and no key's state exceeds a constant,
    * so the plan survives a 100× scale-up as-is. */
  def dupSpans(d: DataFrame, w: Int = DupSpanW): DataFrame = {
    val grams = d.withColumn("toks", expr(toksExpr))
      // sequence(1, 0) is DESCENDING, so guard short docs with CASE; NOT
      // array_distinct — window POSITIONS are the unit being counted.
      .withColumn("grams", expr(
        s"CASE WHEN size(toks) >= $w THEN " +
          s"transform(sequence(1, size(toks) - ${w - 1}), " +
          s"i -> xxhash64(concat_ws(' ', slice(toks, i, $w)))) " +
          "ELSE array() END"))
      .select(col("doc_id"), col("lang"), col("source"), col("grams"))
    // explode_outer + null filter: the InferFiltersFromGenerate guard
    // (plain explode would re-tokenize per element after pushdown).
    val pos = grams
      .select(col("doc_id"), explode_outer(col("grams")).as("gh"))
      .filter(col("gh").isNotNull)
    val perDocGram = pos.groupBy(col("gh"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val dupGrams = perDocGram.groupBy(col("gh"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select("gh")
    val perDoc = perDocGram.join(dupGrams, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_dup_windows"),
        count(lit(1)).as("n_dup_grams"))
    grams
      .select(col("doc_id"), col("lang"), col("source"),
        size(col("grams")).cast("bigint").as("n_windows"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_dup_windows", coalesce(col("n_dup_windows"), lit(0L)))
      .withColumn("n_dup_grams", coalesce(col("n_dup_grams"), lit(0L)))
      .withColumn("dup_frac",
        Num.guardedRatio(col("n_dup_windows"), col("n_windows"), 4))
      .select("doc_id", "lang", "source", "n_windows", "n_dup_windows",
        "n_dup_grams", "dup_frac")
  }

  /** Span window width: 8 words — long enough that an organic collision
    * is content (measured ~9% duplicated windows at sf0.01, vs Lee et
    * al.'s 50-token production setting for web corpora), short enough to
    * catch template fragments inside otherwise-distinct docs. */
  val DupSpanW: Int = 8

  def dupSpans(s: SparkSession, dir: String): DataFrame =
    dupSpans(docs(s, dir))

  // ---------------------------------------------------------------- //
  // Data-derived source rebalancing                                  //
  // ---------------------------------------------------------------- //

  /** Temperature-based source rebalancing (α = 0.5): per-source keep rate
    * ∝ √(min_count / n_source), so the rarest source keeps 100% and a
    * source 4× the minimum keeps 50% — the multilingual-sampling move,
    * applied to sources, with DATA-DERIVED rates (vs the fixed rates of
    * [[TextOps.sampleStratified]]). Selection is the same content-
    * independent md5 bucketing as hashSplit: reproducible on any engine,
    * stable under repartitioning.
    *
    * Cross-engine exactness: n/min are integers; `/`, `sqrt`, `*` are
    * correctly-rounded IEEE ops on both engines and `floor` is exact, so
    * the derived integer rate is identical — no double survives into the
    * output. Plan shape: one fixed-width aggregate (≤ |sources| rows),
    * broadcast back over the scan, narrow filter. One shuffle total. */
  def weightedSourceSample(d: DataFrame): DataFrame = {
    // The per-source count table is metadata-scale (≤ |sources| rows —
    // same contract-bounded-collect class as IvfCosine's centroids), so
    // the min and the rates are derived driver-side from ONE scan
    // instead of letting the min() re-execute the counts subtree (which
    // would re-scan the corpus). Integer counts → one IEEE sqrt/÷ →
    // floor: the same engine-exact math as the oracle.
    val counts = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    if (counts.isEmpty)
      return d.select(col("doc_id"), col("lang"), col("source"),
        lit(0L).as("n_src"), lit(0).as("keep_rate_pct"),
        lit(0).as("bucket100")).limit(0)
    val minN = counts.map(_._2).min
    val rates = d.sparkSession.createDataFrame(counts.toSeq.map {
      case (src, n) =>
        val pct = math.max(1,
          math.floor(100 * math.sqrt(minN.toDouble / n)).toInt)
        (src, n, pct)
    }).toDF("source", "n_src", "keep_rate_pct")
    d.join(broadcast(rates), Seq("source"))
      .withColumn("bucket100", expr(
        "cast(pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, " +
          "15), 16, 10) as bigint), 100L) as int)"))
      .filter(col("bucket100") < col("keep_rate_pct"))
      .select("doc_id", "lang", "source", "n_src", "keep_rate_pct",
        "bucket100")
  }

  def weightedSourceSample(s: SparkSession, dir: String): DataFrame =
    weightedSourceSample(docs(s, dir))

  // ---------------------------------------------------------------- //
  // Deterministic source-interleaved training order                  //
  // ---------------------------------------------------------------- //

  /** Deterministic source-interleaved global training order — the data-
    * MIXING stage ([[weightedSourceSample]] decides how much of each
    * source survives; this decides the ORDER the mixture is consumed
    * in): round-robin across sources, so any contiguous training window
    * sees every still-alive source at equal rate. Emits per-doc
    * `src_idx` (position of the doc's source in the sorted source
    * list), `src_pos` (the doc's 1-based rank within its source, by
    * doc_id), and the sort key
    * `interleave_key = (src_pos − 1) · n_sources + src_idx`.
    * Epoch r of the key space holds the r-th doc of every surviving
    * source; after a source exhausts, its slots are gaps — harmless in
    * a SORT key, and the price of deriving the order arithmetically.
    *
    * NO global or per-source window anywhere (the rankSpendDeciles
    * rule: a `partitionBy(source)` window funnels an entire source —
    * billions of docs at 100 TB — through ONE task). Instead the
    * corpus is range-partitioned by (source, doc_id), a driver-
    * collected (pid, source) stats pass (≤ P + |sources| rows —
    * metadata-scale) yields per-slice rank offsets, and local
    * row_number windows partitioned by (pid, source) stitch to the
    * exact per-source rank. One range shuffle + one broadcast join;
    * values are invariant to where the sampled range boundaries fall. */
  def mixInterleave(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    val parts = s.sessionState.conf.numShufflePartitions
    val base = d.select(col("doc_id"), col("lang"), col("source"))
      // persist freezes the sampled range boundaries so pid assignment
      // is identical between the stats job and the composition
      .repartitionByRange(parts, col("source"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .persist()
    val stats = base.groupBy(col("pid"), col("source"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    if (stats.isEmpty)
      return base.select(col("doc_id"), col("lang"), col("source"),
        lit(0).as("src_idx"), lit(0L).as("src_pos"),
        lit(0L).as("interleave_key")).limit(0)
    val srcs = stats.map(_._2).distinct.sorted
    val srcIdx = srcs.zipWithIndex.toMap
    // per (pid, source) offset = rows of the same source in lower pids
    // (range partitioning keeps each source's pids contiguous)
    var curSrc = ""; var acc = 0L
    val offRows = stats.sortBy(t => (t._2, t._1)).map {
      case (pid, src, c) =>
        if (src != curSrc) { curSrc = src; acc = 0L }
        val r = org.apache.spark.sql.Row(pid, src, acc, srcIdx(src))
        acc += c; r
    }
    val offDf = s.createDataFrame(
      s.sparkContext.parallelize(offRows.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("src_off",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("src_idx",
          org.apache.spark.sql.types.IntegerType))))
    val w = Window.partitionBy(col("pid"), col("source"))
      .orderBy(col("doc_id"))
    base
      .withColumn("pos_local", row_number().over(w).cast("long"))
      .join(broadcast(offDf), Seq("pid", "source"))
      .withColumn("src_pos", col("src_off") + col("pos_local"))
      .withColumn("interleave_key",
        (col("src_pos") - 1) * lit(srcs.length.toLong) + col("src_idx"))
      .select("doc_id", "lang", "source", "src_idx", "src_pos",
        "interleave_key")
  }

  def mixInterleave(s: SparkSession, dir: String): DataFrame =
    mixInterleave(docs(s, dir))

  // ---------------------------------------------------------------- //
  // PII masking                                                      //
  // ---------------------------------------------------------------- //

  /** PII patterns shared verbatim by Spark (Java regex) and the DuckDB
    * oracle (RE2): only constructs with identical semantics in both —
    * explicit classes, `{m,n}` bounds, ASCII `\b`. No `\s`/`\d`
    * shorthands (engine-dependent class membership). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}[ -][0-9]{3,4}"

  /** PII detection + masking: count and redact emails, IPv4 addresses and
    * international phone numbers — the scrub every shipped training
    * corpus needs. Pure row-level projection (regexp count + replace
    * chain), zero shuffles at any scale. Masking order is fixed
    * (email → ip → phone) and identical in the oracle, so overlapping
    * matches resolve the same way on both engines. */
  def piiMask(d: DataFrame): DataFrame =
    // lit(pattern) keeps the regex out of SQL-literal escape processing
    // (an expr() single-quoted '\b' would silently become a backspace).
    d.withColumn("n_emails",
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))))
      .withColumn("n_ipv4",
        size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))))
      .withColumn("masked",
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), PhoneRe, "<PHONE>"))
      .withColumn("masked_len", length(col("masked")))
      .withColumn("is_clean",
        when(col("n_emails") + col("n_ipv4") + col("n_phones") === 0, 1)
          .otherwise(0).cast("int"))
      .select("doc_id", "lang", "source", "n_emails", "n_ipv4",
        "n_phones", "masked_len", "is_clean")

  def piiMask(s: SparkSession, dir: String): DataFrame =
    // No Layout.spread here: the op's contract is a zero-shuffle pure
    // projection (PlanSpec), and regex matching parallelizes with the
    // scan's own splits on any real table.
    piiMask(s.read.parquet(s"$dir/documents.parquet"))

  // ---------------------------------------------------------------- //
  // Composite keep-set pipeline                                      //
  // ---------------------------------------------------------------- //

  /** The full curation pipeline as one dataflow: a training document
    * survives iff it (a) passes the shape-quality gates
    * ([[TextOps.qualityFilter]]), (b) is the canonical copy in the exact-
    * dedup pass (doc_id = min over its fingerprint group), (c) is not
    * repetition-flagged, and (d) shares no 5-gram with the benchmark
    * partition. Output carries every gate's verdict for provenance — the
    * audit trail curation pipelines keep per shipped document.
    *
    * Every component subtree is doc_id-keyed, so the final joins
    * co-partition on one key. The docs frame is persisted for the run:
    * the repetition and decontamination gates (frame-based forms) read
    * the cached rows instead of re-scanning the corpus, and the two
    * TextOps gates keep their dir-based entry (their tokenizations are
    * gate-specific either way — each gate is one linear pass). */
  def corpusClean(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).persist()
    val training = d.filter(col("source") =!= "src0")
    // The gate IS qualityFilter (one source of truth — its thresholds and
    // this query's oracle, which composes $qualityFilter, move together).
    val quality = TextOps.qualityFilter(s, dir)
      .select(col("doc_id"), lit(1).cast("int").as("pass_quality"))
    val canonical = TextOps.dedupExact(s, dir)
      .select(col("canonical_doc_id").as("doc_id"),
        lit(1).cast("int").as("is_canonical"))
    val rep = repetitionStats(d)
      .select(col("doc_id"), col("is_repetitive"))
    val cont = decontaminate(training, d.filter(col("source") === "src0"))
      .select(col("doc_id"), col("is_contaminated"))
    // quality/canonical filtering IS the inner join (a miss means drop),
    // so join inner and carry the surviving verdicts as the provenance
    // columns (constant 1 by construction — the oracle writes the same
    // literals). The verdict frame is narrow — materialize it eagerly so
    // the shared docs cache releases here instead of leaking into
    // long-lived sessions (the ContainmentDedup/KMeans convention).
    val out = training.select("doc_id", "lang", "source")
      .join(quality, Seq("doc_id"))
      .join(canonical, Seq("doc_id"))
      .join(rep, Seq("doc_id"))
      .join(cont, Seq("doc_id"))
      .filter(col("is_repetitive") === 0 && col("is_contaminated") === 0)
      .select("doc_id", "lang", "source", "pass_quality", "is_canonical",
        "is_repetitive", "is_contaminated")
      .localCheckpoint()
    d.unpersist()
    out
  }
}
