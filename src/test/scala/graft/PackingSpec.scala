package graft

import graft.text.Packing
import org.apache.spark.sql.functions._

/** Sequence packing and context-window chunking: budget/overlap edge
  * semantics the registered corpus can't pin. */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("packing is greedy-by-start, never splits a doc, covers all") {
    val dir = tmpDir("pack")
    // 10-token docs against a 16-token budget in ONE shard (force by
    // using one doc per shard check separately — here shards=1).
    writeDocs(dir, (1L to 5L).map(i => (i, ("tok " * 10).trim)))
    val out = Packing.packSequences(spark, dir, budget = 16L, shards = 1)
      .orderBy("doc_id").collect()
    assert(out.length == 5, "every doc gets exactly one assignment")
    // cumulative starts 0,10,20,30,40 → sequences 0,0,1,1,2
    assert(out.map(_.getAs[Long]("seq_id")).toSeq ==
      Seq(0L, 0L, 1L, 1L, 2L))
    assert(out.map(_.getAs[Long]("seq_offset")).toSeq ==
      Seq(0L, 10L, 4L, 14L, 8L))
  }

  test("a doc larger than the budget owns its start sequence") {
    val dir = tmpDir("pack-big")
    writeDocs(dir, Seq((1L, ("tok " * 30).trim), (2L, ("tok " * 4).trim)))
    val out = Packing.packSequences(spark, dir, budget = 16L, shards = 1)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("seq_id") == 0L, "oversized doc starts seq 0")
    // next doc starts at cum 30 → sequence 1 (the oversized doc spilled
    // past the budget; packing never splits — chunking does)
    assert(out(1).getAs[Long]("seq_id") == 1L)
  }

  test("empty docs pack with zero tokens and chunk to zero rows") {
    val dir = tmpDir("pack-empty")
    writeDocs(dir, Seq((1L, ""), (2L, "abc")))
    val packed = Packing.packSequences(spark, dir, shards = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap
    assert(packed(1L) == 0L && packed(2L) == 1L)
    val chunks = Packing.chunkDocuments(spark, dir, chunk = 2, overlap = 0)
    assert(chunks.filter(col("doc_id") === 1L).count() == 0,
      "empty doc yields no chunks")
    assert(chunks.filter(col("doc_id") === 2L).count() == 2) // "ab","c"
  }

  test("a trailing window wholly inside the previous chunk is suppressed") {
    val dir = tmpDir("chunk-tail")
    // len 81, chunk 30, overlap 10 (stride 20): naive starts 1..81 would
    // end with a chunk at 81 covering 81..81 — already inside the chunk
    // at 61 (61..81). The bound len-overlap = 71 drops it; coverage
    // still reaches the end.
    writeDocs(dir, Seq((1L, "x" * 81)))
    val out = Packing.chunkDocuments(spark, dir, chunk = 30, overlap = 10)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getAs[Int]("chunk_start")).toSeq == Seq(1, 21, 41, 61))
    assert(out.last.getAs[Int]("chunk_start") +
      out.last.getAs[Int]("chunk_len") - 1 == 81, "still covers the end")
  }

  test("chunks cover every char and overlap by exactly `overlap`") {
    val dir = tmpDir("chunk")
    val text = (1 to 100).map(i => ('a' + i % 26).toChar).mkString
    writeDocs(dir, Seq((1L, text)))
    val out = Packing.chunkDocuments(spark, dir, chunk = 30, overlap = 10)
      .orderBy("chunk_idx").collect()
    // stride 20: starts 1,21,41,61,81 → lens 30,30,30,30,20
    assert(out.map(_.getAs[Int]("chunk_start")).toSeq ==
      Seq(1, 21, 41, 61, 81))
    assert(out.map(_.getAs[Int]("chunk_len")).toSeq ==
      Seq(30, 30, 30, 30, 20))
    // coverage: last chunk reaches the end
    assert(out.last.getAs[Int]("chunk_start") +
      out.last.getAs[Int]("chunk_len") - 1 == text.length)
    // digests are real MD5s of the substrings
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(text.substring(0, 30).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.head.getAs[String]("chunk_md5") == expect)
  }
}
