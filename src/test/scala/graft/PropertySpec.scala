package graft

import graft.silver.{Dedup, Sessionize}
import graft.util.Skew
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized invariants (seeded, 20 trials each) over the core operators —
  * the property-based layer from SURVEY.md §5. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomEvents(seed: Long, n: Int) = {
    val rnd = new Random(seed)
    val t0 = 1700000000L * 1000000L
    val rows = (0 until n).map { i =>
      (i.toLong, rnd.nextInt(5).toLong,
        t0 + rnd.nextInt(7 * 24 * 3600).toLong * 1000000L,
        Seq("view", "click", "purchase", "error")(rnd.nextInt(4)),
        math.round(rnd.nextDouble() * 10000) / 100.0)
    }
    rows.toDF("event_id", "user_id", "ts_us", "event_type", "value")
      .withColumn("datetime", to_date(timestamp_micros(col("ts_us"))))
      .withColumn("value_cents",
        expr("cast(round(value * 100, 0) as bigint)"))
      .withColumn("webtoon_id",
        concat(lit("w"), (col("event_id") % 3).cast("string")))
      .withColumn("episode_id",
        concat(lit("e"), (col("event_id") % 7).cast("string")))
      .withColumn("country", lit("KR"))
      .withColumn("platform", lit("ios"))
      .withColumn("device", lit("phone"))
      .withColumn("browser", lit("chrome"))
  }

  test("property: interval-join salt arm == plain arm on random " +
      "interval sets at random caps") {
    // The 2-D salt split must be invisible at ANY cap (g = ceil(m/cap)
    // varies per bucket): random session envelopes with heavy overlap,
    // random hot-bucket caps, candidate-cell uniqueness and overlap
    // exactness all under test at once.
    val rnd = new Random(31)
    for (trial <- 1 to 3) {
      val n = 40 + rnd.nextInt(60)
      val rows = (0 until n).map { i =>
        val s = rnd.nextInt(10) * graft.ops.IntervalJoin.BucketUs / 2 +
          rnd.nextInt(1000000)
        val span = 1L +
          (rnd.nextDouble() * 2 * graft.ops.IntervalJoin.BucketUs).toLong
        (s"sess_$i", s, s + span)
      }
      val sess = rows.toDF("session_id", "s", "e")
      def buckets(df: org.apache.spark.sql.DataFrame) =
        df.select(col("session_id"), col("s"), col("e"),
          explode_outer(expr(
            s"sequence(s div ${graft.ops.IntervalJoin.BucketUs}L, " +
              s"e div ${graft.ops.IntervalJoin.BucketUs}L)")).as("bkt"))
          .filter(col("bkt").isNotNull)
      val plain = graft.ops.IntervalJoin.pairsOf(buckets(sess),
        salted = false, cap = 4096L).distinct().collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val cap = 1L + rnd.nextInt(6)
      val salted = graft.ops.IntervalJoin.pairsOf(buckets(sess),
        salted = true, cap = cap).distinct().collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(plain == salted,
        s"trial $trial cap=$cap: plain-only=${(plain -- salted).take(3)}"
          + s" salted-only=${(salted -- plain).take(3)}")
      assert(plain.nonEmpty, s"trial $trial generated no overlaps")
    }
  }

  test("property: dedup is idempotent and a no-op on unique keys") {
    for (seed <- 1 to 10) {
      val ev = randomEvents(seed, 200)
      val once = Dedup.keepLatest(ev)
      assert(once.count() == ev.count()) // unique event_ids
      val withDups = ev.unionByName(
        ev.limit(50).withColumn("ts_us", col("ts_us") + 1))
      val d1 = Dedup.keepLatest(withDups)
      val d2 = Dedup.keepLatest(d1)
      assert(d1.count() == ev.count())
      assert(d2.exceptAll(d1).isEmpty && d1.exceptAll(d2).isEmpty)
    }
  }

  test("property: sessionization invariants hold on random streams") {
    for (seed <- 11 to 20) {
      val ev = randomEvents(seed, 300)
      val sess = Sessionize.sessions(ev)
      // event conservation: session rows partition the input
      assert(sess.agg(sum(col("n_events"))).head.getLong(0) == 300L)
      // session key is unique
      assert(sess.count() ==
        sess.select(Sessionize.SessionKey.map(col): _*).distinct().count())
      // measures well-formed
      val bad = sess.filter(col("duration_ms") < 0 ||
        col("end_us") < col("start_us") ||
        (col("is_complete") === 1 && col("is_exit") === 1) ||
        col("max_value_cents") > col("sum_value_cents")).count()
      assert(bad == 0)
      // every event ts within its session bounds is implied by min/max agg;
      // check session_id groups respect the gap on a sample user
      val gaps = Sessionize.assignSessions(ev)
        .withColumn("prev", lag(col("ts_us"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("session_id"))
            .orderBy(col("ts_us"), col("event_id"))))
        .filter(col("prev").isNotNull &&
          col("ts_us") - col("prev") > graft.ingest.Events.SessionGapUs)
      assert(gaps.count() == 0)
    }
  }

  test("property: chunking covers every char with exact overlaps") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val chunk = 16 + rnd.nextInt(48)
      val overlap = rnd.nextInt(chunk) // in [0, chunk)
      val stride = chunk - overlap
      val dir = tmpDir(s"prop-chunk-$seed")
      val docs = (1L to 20L).map(i =>
        (i, new Random(seed * 100 + i)
          .alphanumeric.take(rnd.nextInt(300)).mkString))
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = graft.text.Packing
        .chunkDocuments(spark, dir, chunk, overlap)
        .collect().groupBy(_.getLong(0))
      for ((id, text) <- docs) {
        val chunks = out.getOrElse(id, Array.empty)
          .sortBy(_.getAs[Int]("chunk_idx"))
        if (text.isEmpty) assert(chunks.isEmpty)
        else {
          // starts advance by exactly stride; first is 1
          val starts = chunks.map(_.getAs[Int]("chunk_start")).toSeq
          assert(starts == starts.indices.map(i => 1 + i * stride))
          // last chunk reaches the end of the doc (full coverage)
          val last = chunks.last
          assert(last.getAs[Int]("chunk_start") +
            last.getAs[Int]("chunk_len") - 1 == text.length,
            s"doc $id len ${text.length} not covered")
          // no fully-redundant trailing window
          if (chunks.length > 1)
            assert(starts.last <= text.length - overlap)
          // digest honesty on a random chunk
          val c = chunks(rnd.nextInt(chunks.length))
          val sub = text.substring(c.getAs[Int]("chunk_start") - 1,
            math.min(c.getAs[Int]("chunk_start") - 1 + chunk, text.length))
          val md = java.security.MessageDigest.getInstance("MD5")
          assert(c.getAs[String]("chunk_md5") ==
            md.digest(sub.getBytes("UTF-8")).map("%02x".format(_)).mkString)
        }
      }
    }
  }

  test("property: packing is a partition of docs with in-budget offsets") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val budget = 8L + rnd.nextInt(40)
      val dir = tmpDir(s"prop-pack-$seed")
      val docs = (1L to 60L).map(i =>
        (i, ("w " * rnd.nextInt(15)).trim))
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = graft.text.Packing
        .packSequences(spark, dir, budget, shards = 4).collect()
      assert(out.length == 60, "every doc assigned exactly once")
      out.foreach { r =>
        val off = r.getAs[Long]("seq_offset")
        assert(off >= 0 && off < budget, s"offset $off out of budget")
        // seq_id decodes back to (shard, seq)
        val sid = r.getAs[Long]("seq_id")
        assert((sid >> 48) == r.getAs[Int]("shard").toLong)
      }
      // within a (shard, seq), docs are contiguous by doc_id: sequences
      // never interleave
      out.groupBy(r => r.getAs[Int]("shard")).foreach { case (_, rows) =>
        val byId = rows.sortBy(_.getLong(0))
        val seqs = byId.map(_.getAs[Long]("seq_id"))
        assert(seqs.sameElements(seqs.sorted),
          "sequence ids must be monotone in doc order within a shard")
      }
    }
  }

  test("property: mixInterleave keys are unique, ranks dense, and the " +
      "consumption order round-robins surviving sources") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val nSrc = 2 + rnd.nextInt(4)
      val rows = (0 until 100 + rnd.nextInt(200)).map { i =>
        (i.toLong, s"src${rnd.nextInt(nSrc)}")
      }
      val d = rows.toDF("doc_id", "source")
        .withColumn("lang", lit("en"))
        .withColumn("text", lit("x"))
        .withColumn("n_chars", lit(1L))
      val out = graft.text.CorpusOps.mixInterleave(d)
        .select("doc_id", "source", "src_pos", "interleave_key")
        .as[(Long, String, Long, Long)].collect()
      assert(out.length == rows.length, s"seed=$seed lost rows")
      assert(out.map(_._4).distinct.length == out.length,
        s"seed=$seed duplicate keys")
      // per source: positions are exactly 1..n in doc_id order
      for ((src, grp) <- out.groupBy(_._2)) {
        val byPos = grp.sortBy(_._3)
        assert(byPos.map(_._3).toSeq == (1L to grp.length).toSeq,
          s"seed=$seed $src ranks not dense")
        assert(byPos.map(_._1).toSeq == grp.map(_._1).sorted.toSeq,
          s"seed=$seed $src not in doc_id order")
      }
      // round-robin: consuming in key order, within every window of the
      // key space each surviving source appears exactly once per epoch
      val byKey = out.sortBy(_._4)
      val epochs = byKey.groupBy(t => (t._3 - 1)) // epoch = src_pos - 1
      for ((ep, grp) <- epochs)
        assert(grp.map(_._2).distinct.length == grp.length,
          s"seed=$seed epoch $ep repeats a source")
    }
  }

  test("property: dupSpans totals are consistent and vanish on disjoint " +
      "vocabularies") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      // disjoint per-doc vocabularies -> zero duplicated windows
      val disjoint = (0 until 20).map { d =>
        (d.toLong, (0 until 10 + rnd.nextInt(10))
          .map(i => s"w${d}_$i").mkString(" "))
      }
      val d1 = disjoint.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", lit(1L))
      val o1 = graft.text.CorpusOps.dupSpans(d1)
      assert(o1.filter(col("n_dup_windows") =!= 0L ||
        col("dup_frac") =!= 0.0).isEmpty, s"seed=$seed false dup")
      // duplicating every doc makes EVERY window of long docs duplicated
      val d2 = d1.unionByName(d1.withColumn("doc_id", col("doc_id") + 100))
      val o2 = graft.text.CorpusOps.dupSpans(d2)
      assert(o2.filter(col("n_windows") > 0 &&
        col("n_dup_windows") =!= col("n_windows")).isEmpty,
        s"seed=$seed cloned corpus must be fully duplicated")
    }
  }

  test("property: salted aggregation equals plain aggregation") {
    for (seed <- 21 to 25) {
      val rnd = new Random(seed)
      // skewed: 80% of rows on one key
      val rows = (0 until 500).map { i =>
        val k = if (rnd.nextDouble() < 0.8) "hot" else s"k${rnd.nextInt(10)}"
        (k, rnd.nextInt(1000).toLong)
      }
      val df = rows.toDF("k", "v")
      val salted = Skew.saltedSumCount(df, Seq("k"), "v", salts = 8)
        .select("k", "sum_v", "cnt").as[(String, Long, Long)]
        .collect().map { case (k, s, c) => k -> ((s, c)) }.toMap
      val plain = df.groupBy("k")
        .agg(sum("v").as("s"), count(lit(1)).as("c"))
        .as[(String, Long, Long)].collect()
        .map { case (k, s, c) => k -> ((s, c)) }.toMap
      assert(salted == plain)
    }
  }

  test("property: graft_capped_ids == sorted distinct smallest-cap, " +
      "any grouping, any partitioning") {
    graft.functions.SignatureExpressions.register(spark, 4,
      Array(1L), Array(0L), 7L) // registers graft_capped_ids too
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val cap = 1 + rnd.nextInt(12)
      val rows = (0 until 300).map { _ =>
        (rnd.nextInt(8).toLong, rnd.nextInt(60).toLong)
      }
      val df = rows.toDF("grp", "v")
        .repartition(1 + rnd.nextInt(7)) // invariance across partitionings
      val got = df.groupBy(col("grp"))
        .agg(expr(s"graft_capped_ids(v, $cap)").as("ids"))
        .as[(Long, Seq[Long])].collect().toMap
      val want = rows.groupBy(_._1).map { case (g, vs) =>
        g -> vs.map(_._2).distinct.sorted.take(cap)
      }
      assert(got == want, s"seed=$seed cap=$cap")
    }
  }

  test("property: random upsert/upsertScoped/replacePartitions sequences " +
      "equal a driver-side table model, deletions and emptied " +
      "partitions included") {
    // Model: Map[(key, date) -> value]. Each trial applies a random
    // operation sequence to a parquet table through MergeUpsert and to
    // the model in plain Scala; after every op the table must equal the
    // model EXACTLY — this is the guard on the delete-capable modes'
    // edge cases (multi-date scopes, stages that empty a partition,
    // scopes with no staged rows at all, replayed stages).
    import graft.silver.MergeUpsert
    val dates = (1 to 4).map(d => java.sql.Date.valueOf(s"2024-01-0$d"))
    val keys = ('a' to 'f').map(_.toString)
    def df(rows: Seq[((String, java.sql.Date), Double)]) =
      rows.map { case ((k, d), v) => (k, d, v) }
        .toDF("k", "datetime", "v")
    for (seed <- 1 to 3) {
      val rnd = new Random(200 + seed)
      val dir = tmpDir(s"merge-model-$seed")
      var model = Map.empty[(String, java.sql.Date), Double]
      def randomRows(nMax: Int) =
        (0 until 1 + rnd.nextInt(nMax)).map { _ =>
          ((keys(rnd.nextInt(keys.size)), dates(rnd.nextInt(dates.size))),
            (rnd.nextInt(1000) + 1).toDouble)
        }.distinct
      for (step <- 1 to 8) {
        rnd.nextInt(3) match {
          case 0 => // plain keyed upsert: update/insert, never delete
            val stage = randomRows(6).toMap
            MergeUpsert.upsert(spark, dir, df(stage.toSeq),
              Seq("k", "datetime"))
            model = model ++ stage
          case 1 => // scoped recompute of a random key set: model
            // converges to the stage ON the scope (deletions included)
            val scope = keys.filter(_ => rnd.nextBoolean()).toSet
            val stage = randomRows(6).toMap.filter { case ((k, _), _) =>
              scope.contains(k) }
            if (scope.nonEmpty) {
              MergeUpsert.upsertScoped(spark, dir, df(stage.toSeq),
                Seq("k"), scope.toSeq.toDF("k"))
              model = model.filterNot { case ((k, _), _) =>
                scope.contains(k) } ++ stage
            }
          case _ => // whole-date recompute: listed dates replaced
            val affected = dates.filter(_ => rnd.nextBoolean())
            val stage = randomRows(6).toMap.filter { case ((_, d), _) =>
              affected.contains(d) }
            if (affected.nonEmpty) {
              MergeUpsert.replacePartitions(spark, dir, df(stage.toSeq),
                affected)
              model = model.filterNot { case ((_, d), _) =>
                affected.contains(d) } ++ stage
            }
        }
        // A table the delete modes emptied entirely reads as "no data"
        // (schema inference fails on a _SUCCESS-only dir) — the model
        // is empty then too.
        val got =
          try spark.read.parquet(dir)
            .select(col("k"), col("datetime"), col("v"))
            .as[(String, java.sql.Date, Double)].collect()
            .map { case (k, d, v) => ((k, d), v) }.toMap
          catch {
            case _: org.apache.spark.sql.AnalysisException => Map.empty
          }
        assert(got == model, s"seed=$seed step=$step")
      }
    }
  }
}
