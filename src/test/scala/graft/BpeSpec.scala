package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

/** BPE tokenizer: hand-checked first merge, the train↔encode
  * conservation law, and expression-vs-replay encode parity. */
class BpeSpec extends SparkSpec {

  test("first merge is the most frequent pair, ties broken lexically") {
    // low×5, lower×2, newest×6 — (w,e) appears 2+6=8 times, the max.
    val hist = Array(("low", 5L), ("lower", 2L), ("newest", 6L))
    val merges = Bpe.trainMerges(hist, numMerges = 1)
    assert(merges.head == ((0, "w", "e", 8L)))
  }

  test("adjacent-triple counting is non-overlapping") {
    // "aaa" holds ONE mergeable (a,a) occurrence, plus (a,</w>).
    val merges = Bpe.trainMerges(Array(("aaa", 3L)), numMerges = 1)
    assert(merges.head._4 == 3L) // count 3 = word count, once per word
  }

  test("property: conservation holds on random histograms") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcd"
    for (trial <- 1 to 10) {
      val hist = Array.fill(5 + rnd.nextInt(30)) {
        val len = 1 + rnd.nextInt(10)
        (Array.fill(len)(alphabet(rnd.nextInt(alphabet.length)))
          .mkString, 1L + rnd.nextInt(20))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val merges = Bpe.trainMerges(hist, numMerges = 16)
      val initial = hist.map { case (w, c) => (w.length + 1L) * c }.sum
      val saved = merges.map(_._4).sum
      val encoded = hist.map { case (w, c) =>
        replay(w, merges.map(m => (m._2, m._3))).length * c
      }.sum
      assert(encoded == initial - saved,
        s"trial $trial: initial=$initial saved=$saved encoded=$encoded " +
          s"merges=${merges.mkString(";")}")
    }
  }

  test("conservation: every merge's pair_count equals the tokens it saves") {
    // Initial symbols = Σ (len+1)·cnt; each recorded replacement saves
    // exactly one symbol; so re-encoding the training words with the
    // full merge list must land on the difference EXACTLY.
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val hist = Bpe.wordHistogram(docs)
      .filter(col("cnt") >= Bpe.MinCount &&
        length(col("word")) <= Bpe.MaxWordLen)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(Bpe.TopWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val merges = Bpe.trainMerges(hist)
    assert(merges.nonEmpty && merges.map(_._1) == merges.indices)
    assert(merges.forall(_._4 >= Bpe.MinCount))
    val initial = hist.map { case (w, c) => (w.length + 1L) * c }.sum
    val saved = merges.map(_._4).sum
    val encoded = hist.map { case (w, c) =>
      replay(w, merges.map(m => (m._2, m._3))).length * c
    }.sum
    assert(encoded == initial - saved,
      s"initial=$initial saved=$saved encoded=$encoded")
  }

  test("native expression equals a rank-order replay on every doc") {
    val dir = "/root/testdata/sf0.001"
    val stats = Bpe.encodeStats(spark, dir).collect()
    assert(stats.nonEmpty)
    // Independent path: split + replay merges in rank order per word.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), lower(trim(col("text"))).as("norm"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val hist = Bpe.wordHistogram(
      spark.read.parquet(s"$dir/documents.parquet"))
      .filter(col("cnt") >= Bpe.MinCount &&
        length(col("word")) <= Bpe.MaxWordLen)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(Bpe.TopWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val merges = Bpe.trainMerges(hist).map(m => (m._2, m._3))
    stats.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val words = docs(id).split("[ \\t\\n\\u000B\\f\\r]+")
        .filter(_.nonEmpty)
      val expect = words.map(w => replay(w, merges).length.toLong).sum
      assert(row.getAs[Long]("n_tokens") == expect,
        s"doc $id: expr=${row.getAs[Long]("n_tokens")} replay=$expect")
      assert(row.getAs[Long]("n_words") == words.length.toLong)
    }
  }

  /** Rank-order replay encoder — deliberately NOT the expression's
    * lowest-rank-greedy loop; BPE's replay/greedy equivalence makes the
    * two paths comparable. Long words skip merging, as in training. */
  private def replay(word: String,
                     merges: Seq[(String, String)]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ Bpe.EndMark
    if (word.length > Bpe.MaxWordLen) return syms
    merges.foreach { case (l, r) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toArray
    }
    syms
  }
}
