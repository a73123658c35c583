package graft

import graft.ops.EventOps
import graft.sim.Similarity
import graft.text.{MinHashDedup, TextOps}
import graft.tpch.CoreOps
import org.apache.spark.sql.functions._

/** Semantics of the round-3 operator batch: gap sessionization, ranking
  * functions, full-outer churn, grouping sets, stratified sampling,
  * embedding centroids, and the LSH-only (inexact, at-scale) minhash
  * configuration.
  */
class OpsR3Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("gap sessionization: counts partition the events, gaps respected") {
    val sessions = EventOps.sessionizeGap(spark, dir).cache()
    val ev = graft.ingest.Events.raw(spark, dir)
    // every event lands in exactly one session
    assert(sessions.agg(sum("n_events")).head().getLong(0) === ev.count())
    // per user: session_idx is 1..n_sessions with no holes
    val bad = sessions.groupBy("user_id")
      .agg(min("session_idx").as("lo"), max("session_idx").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
    assert(bad.isEmpty)
    // within a session the span is a run: duration consistent
    assert(sessions.filter(
      col("duration_us") =!= col("end_ts_us") - col("start_ts_us")).isEmpty)
    // consecutive sessions of one user are >= 30 min apart
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_idx")
    val gaps = sessions
      .withColumn("prev_end", lag(col("end_ts_us"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("start_ts_us") - col("prev_end") < 1800L * 1000000)
    assert(gaps.isEmpty)
  }

  test("funnel transitions: totals tie out against gap sessions") {
    val sessions = EventOps.sessionizeGap(spark, dir).cache()
    val trans = EventOps.funnelTransitions(spark, dir).cache()
    // every within-session consecutive pair is a transition: per session
    // n_events - 1 of them
    val expected = sessions
      .agg(sum(col("n_events") - 1)).head().getLong(0)
    assert(trans.agg(sum("n_transitions")).head().getLong(0) === expected)
    // gaps were filtered to < 30 min, so every mean is under 1800 s and
    // non-negative (events are time-ordered within the window)
    assert(trans.filter(col("mean_gap_sec") < 0 ||
      col("mean_gap_sec") >= 1800.0).isEmpty)
    // from/to types come from the event-type domain
    val types = graft.ingest.Events.raw(spark, dir)
      .select("event_type").distinct().as[String].collect().toSet
    val ft = trans.select("from_type", "to_type")
      .as[(String, String)].collect()
    assert(ft.forall { case (a, b) => types(a) && types(b) })
    sessions.unpersist(); trans.unpersist()
  }

  test("anomaly z-scores: warmup rows score 0, a planted spike flags") {
    // 30 calm hourly buckets (alternating 10/12 events) then one 300:
    // the spike must flag, the first 8 buckets must score 0 (warmup)
    val rows = (0 until 30).flatMap { h =>
      val n = if (h % 2 == 0) 10 else 12
      (0 until n).map(i => (h.toLong * 100 + i, h, "click"))
    } ++ (0 until 300).map(i => (9000L + i, 30, "click"))
    val dir = tmpDir("anomaly")
    rows.toDF("event_id", "h", "event_type")
      .withColumn("ts", expr(
        "timestamp_micros(cast(h as bigint) * 3600000000)"))
      .withColumn("user_id", col("event_id") % 7)
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .drop("h")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.anomalyHourly(spark, dir)
      .orderBy("window_start_us")
      .select("n_events", "n_trail", "z_score", "is_anomaly")
      .collect()
    assert(out.length == 31)
    // buckets with < 8 trailing observations score exactly 0
    assert(out.take(8).forall(r => r.getDouble(2) == 0.0))
    // calm buckets never flag; the planted spike does, with a huge z
    assert(out.dropRight(1).forall(r => r.getInt(3) == 0))
    val spike = out.last
    assert(spike.getLong(0) == 300 && spike.getLong(1) == 24)
    assert(spike.getInt(3) == 1 && spike.getDouble(2) > 100.0,
      s"spike z=${spike.getDouble(2)}")
  }

  test("resample fills every type to the full span, totals preserved") {
    val out = EventOps.resampleHourlyFilled(spark, dir).cache()
    val types = out.select("event_type").distinct().count()
    val hours = out.select("window_start_us").distinct().count()
    // dense grid: every type has every hour of the global span
    assert(out.count() === types * hours)
    // filled zeros are flagged, non-zeros are not
    assert(out.filter((col("n_events") === 0) =!=
      (col("is_gap") === 1)).isEmpty)
    // event totals survive the fill
    val total = graft.ingest.Events.raw(spark, dir).count()
    assert(out.agg(sum("n_events")).head().getLong(0) === total)
    out.unpersist()
  }

  test("scd2 device history partitions each user's timeline") {
    val out = EventOps.scd2UserDevice(spark, dir).cache()
    // versions dense 1..n per user; exactly one open (current) version
    val byUser = out.groupBy("user_id")
      .agg(min("version").as("lo"), max("version").as("hi"),
        count(lit(1)).as("n"),
        sum("is_current").as("n_open"))
    assert(byUser.filter(col("lo") =!= 1L || col("hi") =!= col("n") ||
      col("n_open") =!= 1L).isEmpty)
    // intervals are ordered and ADJACENT: each version's valid_to is
    // the next version's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val bad = out
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("valid_to_us") =!= col("next_from"))
    assert(bad.isEmpty)
    // adjacent versions change device
    val flip = out
      .withColumn("prev_dev", lag(col("device"), 1).over(w))
      .filter(col("prev_dev").isNotNull &&
        col("prev_dev") === col("device"))
    assert(flip.isEmpty, "consecutive versions must differ in device")
    // run sizes tie out to the cleansed event count
    val total = graft.ingest.Events.cleansed(spark, dir).count()
    assert(out.agg(sum("n_events")).head().getLong(0) === total)
    out.unpersist()
  }

  test("z-order key interleaves bits and clusters both dimensions") {
    val out = EventOps.zorderKey(spark, dir).cache()
    // independent scalar reimplementation of the interleave
    def z(u: Long, h: Long): Long = {
      var acc = 0L
      for (i <- 0 until 16) {
        acc += (((u % 65536) >> i) & 1) << (2 * i)
        acc += (((h % 65536) >> i) & 1) << (2 * i + 1)
      }
      acc
    }
    val rows = out.select("user_id", "hour_idx", "z_value")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (u, h, zv) => zv == z(u, h) })
    // locality: equal (user, hour) pairs share a key; changing either
    // dimension by 1 changes the key
    assert(z(5, 7) != z(6, 7) && z(5, 7) != z(5, 8))
    out.unpersist()
  }

  test("dau/wau: wau dominates dau and matches a brute-force rescan") {
    val out = EventOps.dauWau(spark, dir).cache()
    assert(out.filter(col("wau_7d") < col("dau")).isEmpty)
    // brute force: per day, distinct users across the trailing 7 days
    val active = graft.ingest.Events.raw(spark, dir)
      .transform(graft.ingest.Events.withTsUs)
      .select(col("user_id"),
        to_date(timestamp_micros(col("ts_us"))).as("day"))
      .distinct().cache()
    val brute = active.select(col("day")).distinct().as("d")
      .join(active.as("a"),
        col("a.day") <= col("d.day") &&
          col("a.day") >= date_sub(col("d.day"), 6))
      .groupBy(col("d.day").as("day"))
      .agg(countDistinct(col("a.user_id")).as("wau_expected"))
    val mismatch = out.join(brute, Seq("day"))
      .filter(col("wau_7d") =!= col("wau_expected"))
    assert(mismatch.isEmpty, mismatch.collect().mkString(","))
    active.unpersist(); out.unpersist()
  }

  test("path sequences tie out against gap sessions") {
    val sessions = EventOps.sessionizeGap(spark, dir).cache()
    val paths = EventOps.pathTopSequences(spark, dir, topK = 1000000)
      .cache()
    // full path table (unbounded topK): session totals must tie out
    assert(paths.agg(sum("n_sessions")).head().getLong(0) ===
      sessions.count())
    // path length distribution matches session event counts
    val evByLen = sessions.groupBy(col("n_events")).count()
      .as[(Long, Long)].collect().toMap
    val pathByLen = paths
      .withColumn("len", size(split(col("path"), ">")).cast("long"))
      .groupBy(col("len")).agg(sum("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(pathByLen == evByLen, "path lengths must mirror session sizes")
    // the registered top-20 is ordered by (count desc, path)
    val top = EventOps.pathTopSequences(spark, dir)
      .select("path", "n_sessions").as[(String, Long)].collect()
    assert(top.length <= 20)
    assert(top.sliding(2).forall {
      case Array((pa, ca), (pb, cb)) => ca > cb || (ca == cb && pa < pb)
      case _ => true
    })
    sessions.unpersist(); paths.unpersist()
  }

  test("dq expectations count planted violations per check") {
    val dqDir = tmpDir("dq")
    // 5 clean rows + one violation of each events constraint
    val base = (0 until 5).map(i =>
      (i.toLong, 1704067200000000L + i * 1000000L, i.toLong,
        "view", 1.0, "{}"))
    val bad = Seq(
      (100L, 1704067200000000L, -1L, "view", 1.0, "{}"),   // stand-in row
      (101L, 1704067200000000L, 7L, "view", -5.0, "{}"),   // nonpos value
      (102L, 1704067200000000L, 7L, "mystery", 1.0, "{}"), // bad type
      (0L, 1704067200000000L, 7L, "view", 1.0, "{}"),      // dup event_id
      (104L, 1804067200000000L, 7L, "view", 1.0, "{}"))    // ts oob
    val df = (base ++ bad)
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(ts_us)")).drop("ts_us")
      // null user on the stand-in row
      .withColumn("user_id",
        when(col("user_id") < 0, lit(null)).otherwise(col("user_id")))
    df.write.mode("overwrite").parquet(s"$dqDir/events.parquet")
    Seq((1L, "hello", 5L), (2L, "", 0L), (3L, "abc", 99L))
      .toDF("doc_id", "text", "n_chars")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .write.mode("overwrite").parquet(s"$dqDir/documents.parquet")
    val out = EventOps.dqExpectations(spark, dqDir)
      .select("check_name", "n_violations", "pass")
      .as[(String, Long, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("not_null_user_id") == ((1L, 0)))
    assert(out("positive_value") == ((1L, 0)))
    assert(out("known_event_type") == ((1L, 0)))
    assert(out("unique_event_id") == ((1L, 0)))
    assert(out("ts_in_ingest_year") == ((1L, 0)))
    assert(out("n_chars_consistent") == ((1L, 0)))
    assert(out("nonempty_text") == ((1L, 0)))
    // and on the real harness tables every check passes
    val clean = EventOps.dqExpectations(spark, dir)
    assert(clean.filter(col("pass") =!= 1).isEmpty)
    assert(clean.count() == 7)
  }

  test("webtoon co-occurrence pairs are symmetric-complete and lift " +
      "sane") {
    val out = graft.ops.EventOps.cooccurrenceWebtoons(spark, dir).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // ordered pairs only, no self-pairs, support within marginals
    assert(rows.forall(r => r.getAs[String]("webtoon_a") <
      r.getAs[String]("webtoon_b")))
    assert(out.filter(col("n_ab") > col("n_a") ||
      col("n_ab") > col("n_b")).isEmpty)
    // pair totals tie out against a direct basket-size computation:
    // sum n_ab over pairs == sum C(|basket|, 2) over baskets
    val baskets = graft.ingest.Events.cleansed(spark, dir)
      .select("user_id", "datetime", "webtoon_id").distinct()
      .groupBy("user_id", "datetime").count()
      .select(expr("count * (count - 1) div 2").as("pairs"))
      .agg(sum("pairs")).head().getLong(0)
    assert(out.agg(sum("n_ab")).head().getLong(0) === baskets)
    out.unpersist()
  }

  test("rfm segments partition customers and respect thresholds") {
    val out = graft.tpch.CoreOps.rfmSegments(spark, dir).cache()
    // every customer exactly once
    val customers = spark.read
      .parquet(s"$dir/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(out.count() === customers)
    // label rules hold row-by-row
    val bad = out.filter(
      (col("segment") === "champion" &&
        !(col("r_days") <= 90 && col("f_orders") >= 12)) ||
      (col("segment") === "dormant" && col("r_days") <= 365) ||
      (col("segment") === "active" &&
        (col("r_days") > 180 || col("f_orders") >= 10)))
    assert(bad.isEmpty, bad.collect().take(3).mkString(","))
    // the reference customer (r_days == 0 exists by construction of ref)
    assert(out.filter(col("r_days") === 0).count() >= 1)
    out.unpersist()
  }

  test("strict funnel honors step order inside sessions") {
    val fDir = tmpDir("funnel-steps")
    val t0 = 1704067200000000L
    // user 1: full ordered funnel; user 2: click BEFORE the first view
    // (must not convert); user 3: purchase with no qualifying click;
    // user 4: no view at all
    val rows = Seq(
      (1L, 1L, t0, "view"), (2L, 1L, t0 + 1000000L, "click"),
      (3L, 1L, t0 + 2000000L, "purchase"),
      (4L, 2L, t0, "click"), (5L, 2L, t0 + 1000000L, "view"),
      (6L, 3L, t0, "view"), (7L, 3L, t0 + 1000000L, "purchase"),
      (8L, 4L, t0, "error"))
    rows.toDF("event_id", "user_id", "ts_us", "event_type")
      .withColumn("ts", expr("timestamp_micros(ts_us)")).drop("ts_us")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$fDir/events.parquet")
    val out = EventOps.funnelSteps(spark, fDir)
      .orderBy("step")
      .select("step", "n_reached", "conversion_from_start")
      .as[(Int, Long, Double)].collect()
    assert(out.toSeq == Seq((1, 3L, 0.75), (2, 1L, 0.25), (3, 1L, 0.25)),
      s"got ${out.toSeq}")
  }

  test("cohort retention: offset-0 diagonal is complete and rates bound") {
    val r = EventOps.cohortRetention(spark, dir).cache()
    // every cohort has its day-0 cell at rate exactly 1.0
    val day0 = r.filter(col("day_offset") === 0)
    assert(day0.filter(col("retention_rate") =!= 1.0 ||
      col("n_active") =!= col("cohort_n")).isEmpty)
    // offsets are non-negative, cells never exceed their cohort
    assert(r.filter(col("day_offset") < 0 ||
      col("n_active") > col("cohort_n")).isEmpty)
    // cohort sizes sum to the distinct-user count
    val users = graft.ingest.Events.raw(spark, dir)
      .select("user_id").distinct().count()
    assert(day0.agg(sum("cohort_n")).head().getLong(0) === users)
    r.unpersist()
  }

  test("rank battery: rank vs dense_rank vs ntile relationships") {
    val r = CoreOps.rankSpendDeciles(spark, dir).cache()
    val n = r.count()
    // deciles are 1..10 and balanced within 1
    val d = r.groupBy("decile").count().as[(Int, Long)].collect().toMap
    assert(d.keySet === (1 to 10).toSet)
    assert(d.values.max - d.values.min <= 1)
    // dense_rank <= rank everywhere; percent_rank in [0,1]
    assert(r.filter(col("spend_dense_rank") > col("spend_rank")).isEmpty)
    assert(r.filter(col("spend_percent_rank") < 0 ||
      col("spend_percent_rank") > 1).isEmpty)
    // max rank equals row count only if the max-spend row is unique;
    // ranks never exceed n
    assert(r.agg(max("spend_rank")).head().getInt(0) <= n)
  }

  test("full-outer churn partitions the union of both customer years") {
    val out = CoreOps.fullOuterChurn(spark, dir)
      .as[(String, Long)].collect().toMap
    def custIn(y: Int) = spark.read
      .parquet(s"$dir/orders.parquet")
      .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
      .select("o_custkey").distinct()
    val a = custIn(1995); val b = custIn(1996)
    assert(out.getOrElse("retained", 0L) === a.intersect(b).count())
    assert(out.getOrElse("churned", 0L) === a.except(b).count())
    assert(out.getOrElse("new", 0L) === b.except(a).count())
  }

  test("grouping sets: chosen sets only, markers distinguish NULL dims") {
    val g = CoreOps.groupingSetsPricing(spark, dir).cache()
    val leaf = g.filter(col("g_flag") === 0 && col("g_status") === 0)
    val byFlag = g.filter(col("g_flag") === 0 && col("g_status") === 1)
    val byStatus = g.filter(col("g_flag") === 1 && col("g_status") === 0)
    // no grand-total set was requested
    assert(g.filter(col("g_flag") === 1 && col("g_status") === 1).isEmpty)
    assert(g.count() === leaf.count() + byFlag.count() + byStatus.count())
    // marginals re-aggregate the leaves
    val leafSum = leaf.groupBy("l_returnflag")
      .agg(sum("sum_qty").as("s")).as[(String, Long)].collect().toMap
    byFlag.select("l_returnflag", "sum_qty").as[(String, Long)]
      .collect().foreach { case (f, s) => assert(leafSum(f) === s) }
  }

  test("stratified sample: deterministic, respects per-lang rates") {
    val s1 = TextOps.sampleStratified(spark, dir)
    val s2 = TextOps.sampleStratified(spark, dir)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    assert(s1.filter(col("bucket100") >= col("keep_rate")).isEmpty)
    // en is downsampled harder than the tail langs
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val kept = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    val all = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("en").toDouble / all("en") < 0.45)
  }

  test("embedding centroids: 64 dims per label, counts match") {
    val c = Similarity.embedCentroids(spark, dir).cache()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val perLabel = emb.groupBy("label").count()
      .as[(Int, Long)].collect().toMap
    assert(c.groupBy("label").count().as[(Int, Long)].collect()
      .forall { case (_, dims) => dims === 64 })
    c.select("label", "n_vectors").distinct().as[(Int, Long)].collect()
      .foreach { case (l, n) => assert(perLabel(l) === n) }
    // centroid of dim d stays within the observed per-dim range
    val r0 = c.filter(col("dim") === 0).agg(min("mean_q"), max("mean_q"))
      .head()
    assert(r0.getDouble(0) >= -2000000 && r0.getDouble(1) <= 2000000)
  }

  test("approx distinct users: 5% HLL contract column holds per group") {
    val r = EventOps.approxDistinctUsers(spark, dir).cache()
    // within_pct IS the oracle-checkable 5% bound; the raw estimate is
    // additionally bounded in-engine by ApproxSpec.
    assert(r.count() > 0)
    assert(r.filter(!col("within_pct")).isEmpty,
      "HLL estimate strayed past 5% of the exact distinct count")
    assert(r.filter(col("exact_users") <= 0).isEmpty)
  }

  test("LSH-only minhash mode agrees with exact clusters on sf0.001") {
    // The at-scale configuration (exact=false) is probabilistic; on this
    // corpus its banding must still recover every component (the memory
    // of a borderline miss is why the REGISTERED query is prefix-exact).
    val exact = MinHashDedup.clusters(spark, dir, 0.6,
      MinHashDedup.PrefixArm).cache()
    val lsh = MinHashDedup.clusters(spark, dir, 0.6,
      MinHashDedup.LshArm).cache()
    assert(exact.count() === lsh.count())
    assert(exact.exceptAll(lsh).isEmpty,
      "LSH-only components diverge from exact components at sf0.001")
  }
}
