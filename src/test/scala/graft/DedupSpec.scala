package graft

import graft.text.{MinHashDedup, SimHashDedup, TextOps}
import graft.util.Num
import org.apache.spark.sql.functions._

/** Fuzzy-dedup scale paths verified against exact baselines: MinHash+LSH
  * candidates must contain every high-Jaccard pair; SimHash chunk blocking
  * must find every pair within the Hamming bound. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 8
  private def corpus = Seq(
    (0L, base),
    (1L, base.replace("lazy", "sleepy")),              // near-dup of 0
    (2L, base),                                        // exact dup of 0
    (3L, "completely different content about spark shuffles and joins " * 6),
    (4L, "another unrelated document mentioning parquet and kafka " * 6),
    (5L, base.replace("quick", "rapid").replace("dog", "cat")) // near-dup
  ).toDF("doc_id", "text")
    .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    .withColumn("n_chars", length(col("text")))

  /** Exact trigram Jaccard for all pairs (brute force baseline). */
  private def bruteJaccard = {
    val tg = corpus
      .withColumn("norm", lower(regexp_replace(col("text"), "\\s+", " ")))
      .withColumn("tg", expr(
        "array_distinct(transform(sequence(1, length(norm) - 2), " +
          "i -> substring(norm, i, 3)))"))
      .select("doc_id", "tg")
    val a = tg.as("a"); val b = tg.as("b")
    a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.tg"), col("b.tg"))).cast("bigint")
          .as("inter"),
        size(array_union(col("a.tg"), col("b.tg"))).cast("bigint").as("uni"))
      .withColumn("jaccard", Num.guardedRatio(col("inter"), col("uni"), 4))
  }

  test("minhash LSH finds every pair with Jaccard >= 0.6") {
    val expected = bruteJaccard.filter(col("jaccard") >= 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty) // the corpus must actually contain near-dups
    val sigs = MinHashDedup.signatures(corpus)
    val candidates = MinHashDedup.candidateEdges(sigs)
      .as[(Long, Long)].collect().toSet
    assert(expected.subsetOf(candidates),
      s"LSH missed ${expected -- candidates}")
    // and the confirm step reproduces the exact-jaccard verdicts
    val confirmed = MinHashDedup
      .confirmedEdges(sigs, candidates.toSeq.toDF("doc_a", "doc_b"), 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(confirmed == expected)
  }

  test("minhash clusters == components of the exact >=0.6 Jaccard graph") {
    val dir = tmpDir("minhash-docs")
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = MinHashDedup.clusters(spark, dir, threshold = 0.6)
      .as[(Long, Long)].collect().toMap
    // Brute-force components: union-find over the exact pair graph.
    val parent = scala.collection.mutable.Map[Long, Long]() ++
      corpus.select("doc_id").as[Long].collect().map(d => d -> d)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    bruteJaccard.filter(col("jaccard") >= 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    val expected = parent.keys.map(d => d -> find(d)).toMap
    assert(got == expected)
    // every doc present exactly once; canonical is the component minimum
    assert(got.size == 6 && got.forall { case (d, c) => c <= d })
  }

  test("star edges keep oversized buckets connected (no skip)") {
    // 200 identical docs: every band bucket holds all of them (size 200 >
    // AllPairsMaxBucket = 128), so connectivity must come from the hub
    // (star) edges alone.
    val dir = tmpDir("minhash-dense")
    val dense = (0L until 200L).map(i => (i, base))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    dense.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = MinHashDedup.clusters(spark, dir, threshold = 0.6)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }

  test("distributed components path matches the driver union-find") {
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L), (2L, 0L), (0L, 1L))
      .toDF("doc_a", "doc_b") // incl. duplicate edge
    val verts = (0L to 5L).toDF("doc_id")
    val dist = MinHashDedup.components(verts, edges, driverMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    val drv = MinHashDedup.components(verts, edges)
      .as[(Long, Long)].collect().toMap
    assert(dist == drv)
    assert(dist == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L,
      5L -> 5L))
  }

  test("driver union-find touches edge endpoints only; singletons stay distributed") {
    val edges = Seq((10L, 11L), (11L, 12L)).toDF("doc_a", "doc_b")
    val ep = MinHashDedup.driverEndpointComponents(edges)
      .as[(Long, Long)].collect().toMap
    // the driver frame holds EXACTLY the edge endpoints — a sparse graph
    // over a huge corpus never ships its vertex set to the driver
    assert(ep.keySet == Set(10L, 11L, 12L),
      "driver path materialized non-endpoint vertices")
    assert(ep.values.toSet == Set(10L))
    val verts = (0L to 14L).toDF("doc_id")
    val all = MinHashDedup.components(verts, edges)
      .as[(Long, Long)].collect().toMap
    assert(all.size == 15)
    assert((0L to 9L).forall(v => all(v) == v) &&
      all(13L) == 13L && all(14L) == 14L, "singletons must map to themselves")
    assert(all(10L) == 10L && all(11L) == 10L && all(12L) == 10L)
  }

  test("auto arm: prefix on the harness corpus, LSH on a template family") {
    val harness = MinHashDedup.signatures(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .cache()
    assert(MinHashDedup.selectArm(harness, 0.6, harness.count()) ==
      MinHashDedup.PrefixArm,
      "gate-scale harness corpus must stay on the exact prefix arm")
    harness.unpersist()

    // One 400-doc near-identical family from a trigram-rich template:
    // every family doc shares its whole frequency-ordered prefix, so the
    // estimated prefix-join volume is ~|shortPrefix|·F² ≈ 20k pairs/doc
    // — far past PrefixBudgetPerDoc.
    val template = base +
      "completely different content about spark shuffles and joins " * 3 +
      "another unrelated document mentioning parquet and kafka " * 3
    val family = (0L until 400L).map(i => (i, template + s" tail$i"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val famSigs = MinHashDedup.signatures(family).cache()
    assert(MinHashDedup.selectArm(famSigs, 0.6, 400L) ==
      MinHashDedup.LshArm,
      "template family must switch to the linear LSH arm")
    famSigs.unpersist()

    // ... and the LSH arm the auto rule picks still clusters the family
    // correctly end-to-end (near-identical docs, jaccard ~0.95).
    val dir = tmpDir("minhash-family")
    family.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = MinHashDedup.clusters(spark, dir, threshold = 0.6)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 400 && got.values.forall(_ == 0L))
  }

  test("exact duplicates collapse to one canonical doc") {
    val dir = tmpDir("docs")
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.dedupExact(spark, dir)
    assert(out.count() == 5) // 6 docs, 0 and 2 identical
    val dup = out.filter(col("dup_count") === 2).collect().head
    assert(dup.getAs[Long]("canonical_doc_id") == 0L)
  }

  test("simhash: identical docs at distance 0, found by chunk blocking") {
    val pairs = SimHashDedup.nearDuplicates(corpus, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m.get((0L, 2L)).contains(0)) // exact dup → hamming 0
    // unrelated docs must not appear within the bound
    assert(!m.contains((3L, 4L)))
  }
}
