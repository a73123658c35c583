package graft

import graft.text.CorpusOps
import graft.sim.KMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral specs for the corpus-curation batch on synthetic inputs the
  * harness corpus can't exercise (planted repetition, PII strings,
  * contamination overlaps, separable clusters). Registered-query parity on
  * the real tables is the DuckDB oracle's job. */
class CorpusOpsSpec extends SparkSpec {

  import spark.implicits._

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("srcX"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("repetitionStats flags a degenerate doc and clears a diverse one") {
    val d = docsDf(
      1L -> "spam spam spam spam spam spam spam spam",
      2L -> "one two three four five six seven eight nine ten")
    val out = CorpusOps.repetitionStats(d)
      .select("doc_id", "n_tokens", "n_distinct", "top_token_n",
        "top_bigram_n", "is_repetitive")
      .collect().map(r => r.getLong(0) -> r).toMap
    val spam = out(1L)
    assert(spam.getLong(1) == 8 && spam.getLong(2) == 1)
    assert(spam.getLong(3) == 8 && spam.getLong(4) == 7)
    assert(spam.getInt(5) == 1, "fully repeated doc must be flagged")
    val ok = out(2L)
    assert(ok.getLong(1) == 10 && ok.getLong(2) == 10)
    assert(ok.getLong(3) == 1 && ok.getLong(4) == 1)
    assert(ok.getInt(5) == 0, "all-distinct doc must pass")
  }

  test("repetitionStats survives an empty document") {
    val d = docsDf(1L -> "", 2L -> "a b")
    val out = CorpusOps.repetitionStats(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("dup_word_ratio")))
      .toMap
    assert(out(1L) == ((0L, 0.0)))
    assert(out(2L)._1 == 2L)
  }

  test("dupSpans counts shared word-8-gram windows, in-doc repeats and " +
      "short docs") {
    val span = "a1 a2 a3 a4 a5 a6 a7 a8" // one exact 8-gram
    val d = docsDf(
      // doc 1: the span once + unique filler -> 2 extra unique windows
      1L -> s"$span u1 u2",
      // doc 2: the span TWICE (in-doc repeat of a shared gram: both
      // occurrences count as duplicated windows); bridge windows between
      // the copies exist only here, so they stay unique
      2L -> s"$span $span",
      // doc 3: no overlap with anything
      3L -> "b1 b2 b3 b4 b5 b6 b7 b8 b9",
      // doc 4: shorter than the window -> zero windows
      4L -> "c1 c2 c3")
    val out = CorpusOps.dupSpans(d)
      .select("doc_id", "n_windows", "n_dup_windows", "n_dup_grams",
        "dup_frac")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out(1L) == ((3L, 1L, 1L, 0.3333)), s"got ${out(1L)}")
    // 16 tokens -> 9 windows; positions 1 and 9 are the planted gram
    assert(out(2L) == ((9L, 2L, 1L, 0.2222)), s"got ${out(2L)}")
    assert(out(3L) == ((2L, 0L, 0L, 0.0)), s"got ${out(3L)}")
    assert(out(4L) == ((0L, 0L, 0L, 0.0)), s"got ${out(4L)}")
  }

  test("classifierScore: weights replay from md5 parity, empty doc safe") {
    val d = docsDf(1L -> "alpha beta alpha", 2L -> "")
    val out = CorpusOps.classifierScore(d)
      .select("doc_id", "n_tokens", "logit_sum", "mean_logit", "keep")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    // independent weight computation from the same md5 rule
    def w(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"qw_$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16) - 128
    }
    val expected = 2 * w("alpha") + w("beta")
    val (n, ls, ml, keep) = out(1L)
    assert(n == 3 && ls == expected)
    assert(ml == math.round(ls.toDouble / 3 * 10000).toDouble / 10000)
    assert(keep == (if (ml > 0) 1 else 0))
    assert(out(2L) == ((0L, 0L, 0.0, 0)), "empty doc must score 0")
  }

  test("mixInterleave round-robins sources and ranks densely per source") {
    // sources of unequal size: a has 2 docs, b has 4
    val d = Seq(
      (1L, "a"), (2L, "b"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "b"))
      .toDF("doc_id", "source")
      .withColumn("lang", lit("en"))
      .withColumn("text", lit("x"))
      .withColumn("n_chars", lit(1L))
    val out = CorpusOps.mixInterleave(d)
      .select("doc_id", "source", "src_idx", "src_pos", "interleave_key")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    assert(out.length == 6)
    assert(out.map(_._5).distinct.length == 6, "keys must be unique")
    // per source: dense 1..n positions
    assert(out.filter(_._2 == "a").map(_._4).sorted.toSeq == Seq(1L, 2L))
    assert(out.filter(_._2 == "b").map(_._4).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // consuming in key order interleaves while both sources are alive,
    // then drains the survivor: a1 b2 a3 b4 b5 b6
    val order = out.sortBy(_._5).map(_._1).toSeq
    assert(order == Seq(1L, 2L, 3L, 4L, 5L, 6L), s"got $order")
  }

  test("decontaminate flags exactly the docs sharing a 5-gram") {
    val bench = docsDf(
      100L -> "the quick brown fox jumps over the lazy dog")
    val train = docsDf(
      1L -> "intro text then the quick brown fox jumps and more",
      2L -> "completely different words with no shared phrases here",
      3L -> "quick brown fox jumps over something else entirely now")
    val out = CorpusOps.decontaminate(train, bench)
      .select("doc_id", "n_contaminated", "is_contaminated")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out(1L)._2 == 1 && out(1L)._1 >= 1,
      "doc 1 shares 'the quick brown fox jumps'")
    assert(out(2L) == ((0L, 0)))
    assert(out(3L)._2 == 1, "doc 3 shares 'quick brown fox jumps over'")
  }

  test("piiMask redacts emails, IPs and phones; counts survive") {
    val d = docsDf(
      1L -> "contact alice.smith+x@example.org or 10.0.42.7 today",
      2L -> "call +49 170 1234 567 now",
      3L -> "perfectly clean text with nothing sensitive")
    val masked = d.withColumn("masked",
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        CorpusOps.EmailRe, "<EMAIL>"), CorpusOps.Ipv4Re, "<IP>"),
        CorpusOps.PhoneRe, "<PHONE>"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("masked")).toMap
    assert(masked(1L) == "contact <EMAIL> or <IP> today")
    assert(masked(2L) == "call <PHONE> now")
    val out = CorpusOps.piiMask(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[Int]("n_ipv4"),
          r.getAs[Int]("n_phones"), r.getAs[Int]("is_clean"))).toMap
    assert(out(1L) == ((1, 1, 0, 0)))
    assert(out(2L) == ((0, 0, 1, 0)))
    assert(out(3L) == ((0, 0, 0, 1)))
  }

  test("weightedSourceSample: rarest source keeps 100%, 4x source ~50%") {
    val d = (1L to 400L).map(i => (i, "txt", "en",
        if (i <= 80) "rare" else "common"))
      .toDF("doc_id", "text", "lang", "source")
    val rates = CorpusOps.weightedSourceSample(d)
      .select("source", "keep_rate_pct").distinct()
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rates("rare") == 100)
    assert(rates("common") == 50, "4x the min count -> sqrt(1/4) = 50%")
  }

  test("kmeans separates two obvious clusters and is deterministic") {
    // Build a parquet embeddings table: ids 0..7 seed the centroids; two
    // tight blobs around orthogonal axes must end in different clusters.
    val dir = tmpDir("kmeans")
    val dim = 64
    def vec(axis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(dim)(0.001f * eps)
      a(axis) = 1.0f; a
    }
    val rows = (0 until 40).map { i =>
      val axis = if (i % 2 == 0) 0 else 32
      (i.toLong, vec(axis, (i % 5) + 1).toSeq, i % 2)
    }
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = KMeans.fit(spark, dir, k = 8, iters = 1)
    // k-means never merges clusters, so several seeds survive per blob;
    // the invariant is PURITY: no cluster mixes the two blobs.
    val purity = out.groupBy("cluster")
      .agg(countDistinct("label").as("nl")).collect()
    assert(purity.forall(_.getLong(1) == 1),
      "no cluster may mix the two orthogonal blobs")
    val again = KMeans.fit(spark, dir, k = 8, iters = 1)
    assert(out.orderBy("vec_id").collect()
      .sameElements(again.orderBy("vec_id").collect()),
      "fit is deterministic")
  }

  test("kmeans seeds the first k vectors even on sparse, offset ids") {
    // Same two-blob corpus but vec_ids 1000, 1010, 1020, … — the old
    // `vec_id < k` seed predicate would select ZERO seeds here and
    // silently return an empty clustering. 'First k by vec_id' must
    // hold on any id space, with cluster ids the seed ranks 0..k−1.
    val dir = tmpDir("kmeans-sparse")
    val dim = 64
    def vec(axis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(dim)(0.001f * eps)
      a(axis) = 1.0f; a
    }
    val rows = (0 until 40).map { i =>
      val axis = if (i % 2 == 0) 0 else 32
      (1000L + 10L * i, vec(axis, (i % 5) + 1).toSeq, i % 2)
    }
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = KMeans.fit(spark, dir, k = 8, iters = 1)
    assert(out.count() == 40, "every vector must be assigned")
    val clusters = out.select("cluster").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(clusters.nonEmpty && clusters.subsetOf((0 until 8).toSet),
      s"cluster ids must be seed ranks 0..7, got $clusters")
    val purity = out.groupBy("cluster")
      .agg(countDistinct("label").as("nl")).collect()
    assert(purity.forall(_.getLong(1) == 1),
      "no cluster may mix the two orthogonal blobs")
  }

  test("kmeans multi-iteration refinement is deterministic and pure") {
    // Exercises the iters > 1 lineage-checkpoint branch: three Lloyd
    // refinements must stay deterministic, keep blob purity, and agree
    // with themselves run-to-run.
    val dir = tmpDir("kmeans-iters")
    val dim = 64
    def vec(axis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(dim)(0.001f * eps)
      a(axis) = 1.0f; a
    }
    val rows = (0 until 40).map { i =>
      val axis = if (i % 2 == 0) 0 else 32
      (i.toLong, vec(axis, (i % 5) + 1).toSeq, i % 2)
    }
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val a = KMeans.fit(spark, dir, k = 8, iters = 3)
    val b = KMeans.fit(spark, dir, k = 8, iters = 3)
    assert(a.orderBy("vec_id").collect()
      .sameElements(b.orderBy("vec_id").collect()),
      "multi-iteration fit must be deterministic")
    val purity = a.groupBy("cluster")
      .agg(countDistinct("label").as("nl")).collect()
    assert(purity.forall(_.getLong(1) == 1),
      "refinement must not mix the orthogonal blobs")
  }

  test("containment catches a quote Jaccard misses") {
    val dir = tmpDir("containment")
    val big = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi " +
      "omega one two three four five six seven eight nine ten")
    val quote = "lambda mu nu xi omicron pi rho sigma"
    Seq((1L, big), (2L, quote), (3L, "unrelated words entirely here"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.text.TextOps.containment(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((2L, 1L)), "quote ⊂ source must be flagged")
    assert(!out.contains((1L, 2L)), "the big doc is NOT inside the quote")
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
    // and the symmetric Jaccard on the same pair stays below its cut
    val j = graft.text.TextOps.ngramJaccard(spark, dir)
      .filter(col("doc_a") === 1L && col("doc_b") === 2L)
      .collect().head
    assert(j.getAs[Int]("is_near_dup") == 0,
      "Jaccard must miss the asymmetric pair (that is containment's job)")
  }

  test("weightedSourceSample returns an empty frame on an empty corpus") {
    val d = docsDf().limit(0)
    val out = CorpusOps.weightedSourceSample(d)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("doc_id", "lang", "source", "n_src",
      "keep_rate_pct", "bucket100"))
  }

  test("zero-norm vectors are excluded from cosine paths, kept by " +
      "centroids") {
    // vec 63 quantizes to all zeros (|x| < 5e-7): cosine against it is
    // 0/0 — NaN in Spark, NULL in DuckDB — so every cosine consumer
    // must drop it (both engines do); the centroid aggregate keeps it
    // (means are defined).
    val dir = tmpDir("zeronorm")
    val dim = 64
    val rows = (0 until 64).map { i =>
      val v =
        if (i == 63) Array.fill(dim)(1e-7f)
        else { val a = Array.fill(dim)(0.01f); a(i % dim) = 1.0f; a }
      (i.toLong, v.toSeq, i % 4)
    }
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val topk = graft.sim.Similarity.cosineTopK(spark, dir)
    assert(topk.filter(col("neighbor_id") === 63L).count() == 0,
      "zero-norm vector must never appear as a neighbor")
    assert(!topk.collect().exists(r => r.getDouble(2).isNaN),
      "no NaN cosine may be emitted")
    val km = graft.sim.KMeans.fit(spark, dir)
    assert(km.filter(col("vec_id") === 63L).count() == 0)
    assert(graft.sim.Similarity.embedCentroids(spark, dir)
      .filter(col("label") === 3).head().getLong(2) == 16L,
      "centroids keep the zero-norm vector (n_vectors counts it)")
  }

  test("corpusClean output joins all four gate verdicts") {
    val out = CorpusOps.corpusClean(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Int]("pass_quality") == 1 &&
      r.getAs[Int]("is_canonical") == 1 &&
      r.getAs[Int]("is_repetitive") == 0 &&
      r.getAs[Int]("is_contaminated") == 0))
    assert(rows.forall(r => r.getAs[String]("source") != "src0"),
      "benchmark partition never ships in the training keep-set")
  }
}
