package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + encoding (Sennrich et al.
  * 2016) — the subword vocabulary step of an LLM data pipeline, shaped
  * for Spark the way production BPE trainers actually run:
  *
  *  - the ONLY corpus-scale work is one word-histogram aggregation
  *    (map-side combined groupBy — the same reduction HuggingFace's
  *    trainer performs before it ever looks at pairs);
  *  - merge training iterates on the REDUCED histogram. The histogram is
  *    vocabulary-scale, not corpus-scale (Heaps' law), and is further
  *    bounded deterministically before the driver sees it: count ≥
  *    [[MinCount]], word length ≤ [[MaxWordLen]], top [[TopWords]] by
  *    (count desc, word asc). Under those caps the collect ships at most
  *    TopWords·(MaxWordLen+8) bytes — metadata-scale at ANY corpus size,
  *    the same gate discipline as the dedup edge ceiling;
  *  - encoding is a native Catalyst expression
  *    ([[graft.functions.BpeEncode]]) holding the learned ranks: one
  *    tight JVM loop per document (the per-doc CodegenFallback
  *    convention of graft.functions — the surrounding projection still
  *    codegens), no UDF, no per-row interpretation of lambda trees.
  *
  * Determinism: words are the same `split(lower(trim(text)), Ws+)`
  * tokens the rest of text/ uses; pair counts are LEFT-TO-RIGHT
  * NON-OVERLAPPING occurrence counts (identical to the number of
  * replacements a merge performs — "aaa" counts (a,a) once); the merge
  * chosen each round is (count desc, left asc, right asc); training
  * stops early when the best pair's count drops below [[MinCount]].
  * Encoding greedily applies the LOWEST-rank adjacent pair until no
  * adjacent pair has a rank — the standard BPE apply order, so equal
  * inputs produce equal token streams on any executor.
  */
object Bpe {

  val NumMerges = 48
  val MinCount = 2
  val TopWords = 65536
  val MaxWordLen = 32
  val EndMark = "</w>"

  /** Corpus word histogram — the one corpus-scale job. */
  def wordHistogram(docs: DataFrame): DataFrame =
    docs
      .select(explode_outer(split(lower(trim(col("text"))),
        (TextOps.Ws + "+"))).as("word"))
      .filter(col("word").isNotNull && col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** The deterministically-bounded histogram the driver trains on. */
  private def boundedHistogram(docs: DataFrame): Array[(String, Long)] =
    wordHistogram(docs)
      .filter(col("cnt") >= MinCount && length(col("word")) <= MaxWordLen)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(TopWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** Count left-to-right non-overlapping adjacent occurrences of every
    * symbol pair across the histogram. */
  private def pairCounts(words: Array[(Array[String], Long)])
      : scala.collection.mutable.HashMap[(String, String), Long] = {
    val m = scala.collection.mutable.HashMap.empty[(String, String), Long]
    words.foreach { case (syms, cnt) =>
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        m.update(p, m.getOrElse(p, 0L) + cnt)
        // non-overlapping: "aaa" counts (a,a) once, matching the single
        // replacement a merge would perform
        i += (if (i + 2 < syms.length && syms(i) == syms(i + 1) &&
          syms(i + 1) == syms(i + 2)) 2 else 1)
      }
    }
    m
  }

  private def replacePair(syms: Array[String], l: String, r: String)
      : Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Pure merge-training loop over a (word, count) histogram. Exposed
    * for the spec's independent cross-check. */
  def trainMerges(hist: Array[(String, Long)],
                  numMerges: Int = NumMerges)
      : Seq[(Int, String, String, Long)] = {
    var words: Array[(Array[String], Long)] = hist.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndMark, c)
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = pairCounts(words)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (c < MinCount) done = true
        else {
          merges += ((rank, l, r, c))
          words = words.map { case (s, n) => (replacePair(s, l, r), n) }
          rank += 1
        }
      }
    }
    merges.result()
  }

  /** Learned merge table over the documents corpus:
    * (rank, left, right, pair_count). */
  def merges(spark: SparkSession, dir: String,
             numMerges: Int = NumMerges): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    trainMerges(boundedHistogram(docs), numMerges)
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Merge table learned by the LAST [[encodeStats]] call in this JVM —
    * the oracle hook. The DuckDB oracle for `text_bpe_encode` replays
    * the ENCODE given the learned merges (training itself is the
    * driver-side loop no single SQL statement can express); Verify
    * builds `oracle_sql.json` AFTER every registered query has run, so
    * interpolating this stash hands the oracle the exact
    * deterministically-trained table the engine used on the same
    * corpus. The merge table itself is pinned by BpeSpec (hand-checked
    * first merge, conservation law, independent replay encoder). */
  @volatile private[graft] var lastLearned: Array[(String, String)] =
    Array.empty

  /** Per-document token accounting under the corpus-trained merges:
    * (doc_id, n_words, n_chars, n_tokens, chars_per_token). The encode
    * runs inside the scan projection via the native expression. */
  def encodeStats(spark: SparkSession, dir: String,
                  numMerges: Int = NumMerges): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val learned = trainMerges(boundedHistogram(docs), numMerges)
      .map { case (_, l, r, _) => (l, r) }.toArray
    lastLearned = learned
    graft.functions.BpeEncode.register(spark, learned)
    docs
      .withColumn("norm", lower(trim(col("text"))))
      .select(col("doc_id"),
        expr(s"size(filter(split(norm, '${TextOps.WsSql}+'), " +
          "t -> t <> ''))").cast("bigint").as("n_words"),
        length(col("norm")).cast("bigint").as("n_chars"),
        expr("graft_bpe_count(norm)").cast("bigint").as("n_tokens"))
      .withColumn("chars_per_token", graft.util.Num.guardedRatio(
        col("n_chars"), col("n_tokens"), 4))
  }
}
