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

  test("manifest accounts every token: spans contiguous, fill 1.0 " +
      "except the shard-last window, overflow = spill past the budget") {
    val dir = tmpDir("pack-manifest")
    // one shard, budget 16; docs 10,10,30,4 tokens →
    // seq 0: docs 1,2 (offsets 0,10; doc2 spills 4) ;
    // seq 1: doc 3 at offset 4 (spills 18 past 16) ;
    // seq 2: (doc 3's tail) ; doc 4 starts cum 50 → seq 3 offset 2.
    writeDocs(dir, Seq((1L, ("tok " * 10).trim), (2L, ("tok " * 10).trim),
      (3L, ("tok " * 30).trim), (4L, ("tok " * 4).trim)))
    val m = Packing.packManifest(spark, dir, budget = 16L, shards = 1)
      .orderBy("seq_id").collect()
    assert(m.map(_.getAs[Long]("seq_id")).toSeq == Seq(0L, 1L, 3L),
      "windows with no ASSIGNED doc (pure spill) have no manifest row")
    assert(m.map(_.getAs[Long]("n_docs")).toSeq == Seq(2L, 1L, 1L))
    assert(m.map(_.getAs[Long]("total_tokens")).toSeq == Seq(20L, 30L, 4L))
    // seq 0 ends at 20 → 4 past budget; seq 1: 4+30=34 → 18 past.
    assert(m.map(_.getAs[Long]("overflow_tokens")).toSeq ==
      Seq(4L, 18L, 0L))
    assert(m.map(_.getAs[Double]("fill_ratio")).toSeq ==
      Seq(1.0, 1.0, 6.0 / 16.0), "last window: spans offsets 2..6 of 16")
    assert(m.map(_.getAs[String]("doc_spans")).toSeq ==
      Seq("1@0+10,2@10+10", "3@4+30", "4@2+4"))
  }

  test("chunk → pack composition: every chunk packed once, doc-local " +
      "order preserved, budget windows advance on cumulative tokens") {
    val dir = tmpDir("pack-chunks")
    // 25 tokens of 4 chars + 24 spaces = 124 chars; chunk 40 / overlap 0
    // → 4 chunks (40,40,40,4 chars). Each token occupies 5 chars incl.
    // its separator space, so a 40-char chunk holds 8 tokens ⇒ 8,8,8,1.
    val text = (1 to 25).map(i => f"t$i%03d").mkString(" ")
    writeDocs(dir, Seq((1L, text), (2L, text)))
    val out = Packing.packChunks(spark, dir, budget = 16L, shards = 1,
      chunk = 40, overlap = 0).orderBy("doc_id", "chunk_idx").collect()
    val chunks = Packing.chunkDocuments(spark, dir, chunk = 40, overlap = 0)
    assert(out.length == chunks.count(), "one assignment per chunk")
    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    assert(d1.map(_.getAs[Long]("n_tokens")).toSeq ==
      Seq(8L, 8L, 8L, 1L))
    // cum 0,8,16,24 under budget 16 → seqs 0,0,1,1; doc 2 continues the
    // same shard at cum 25 → starts 25,33,41,49 ⇒ seqs 1,2,2,3 with
    // offsets 9,1,9,1 (cum mod budget).
    assert(d1.map(_.getAs[Long]("seq_id")).toSeq == Seq(0L, 0L, 1L, 1L))
    val d2 = out.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d2.map(_.getAs[Long]("seq_id")).toSeq == Seq(1L, 2L, 2L, 3L))
    assert(d2.map(_.getAs[Long]("seq_offset")).toSeq ==
      Seq(9L, 1L, 9L, 1L))
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
