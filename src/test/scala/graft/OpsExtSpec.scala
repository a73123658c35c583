package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

/** Semantics of the round-2 operator batch: as-of join (tie inclusion,
  * no-prior-match nulls, latest-wins), banded self-join, cube marginals,
  * pivot, and the integer tf-idf scoring. */
class OpsExtSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join: latest right row at or before, nulls when none") {
    val purchases = Seq(
      (1L, 100L, 10L), // user 1, ts 100
      (1L, 50L, 11L),  // before any view -> null
      (2L, 80L, 12L)   // tie with view at 80 -> matched
    ).toDF("user_id", "purchase_ts_us", "purchase_event_id")
    val views = Seq(
      (1L, 60L, 1000L),
      (1L, 90L, 1001L), // latest before purchase@100
      (2L, 80L, 1002L)  // exactly at the purchase ts
    ).toDF("user_id", "last_view_ts_us", "last_view_event_id")
    val out = AsOfJoin.asOf(purchases, views, Seq("user_id"),
        "purchase_ts_us", "last_view_ts_us")
      .select("purchase_event_id", "last_view_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(10L).contains(1001L))
    assert(out(11L).isEmpty)
    assert(out(12L).contains(1002L))
  }

  test("as-of join: NULL payload field comes from the matched row, not an older one") {
    // The latest right row before ts=100 has a NULL label; a per-column
    // carry would tear the row by backfilling the label from ts=60.
    val left = Seq((1L, 100L, 10L))
      .toDF("user_id", "l_ts", "purchase_id")
    val right = Seq(
      (1L, 60L, Some("old"), 600L),
      (1L, 90L, None, 900L)
    ).toDF("user_id", "r_ts", "label", "amount")
    val row = AsOfJoin.asOf(left, right, Seq("user_id"), "l_ts", "r_ts")
      .select("amount", "label").as[(Option[Long], Option[String])]
      .collect().head
    assert(row._1.contains(900L))
    assert(row._2.isEmpty, "label must be the matched row's NULL, not 'old'")
  }

  test("as-of join matches a per-row brute force on harness events") {
    val dir = "/root/testdata/sf0.001"
    val got = AsOfJoin.attribution(spark, dir)
      .select("purchase_event_id", "last_view_event_id")
      .as[(Long, Option[Long])].collect().toMap
    val e = graft.ingest.Events.raw(spark, dir)
      .transform(graft.ingest.Events.withTsUs)
      .select("event_id", "user_id", "ts_us", "event_type")
      .as[(Long, Long, Long, String)].collect()
    val views = e.filter(_._4 == "view")
    for ((pid, uid, pts, _) <- e.filter(_._4 == "purchase")) {
      val prior = views.filter(v => v._2 == uid && v._3 <= pts)
      val expect =
        if (prior.isEmpty) None
        else Some(prior.maxBy(v => (v._3, v._1))._1)
      assert(got(pid) == expect, s"purchase $pid")
    }
  }

  test("band join counts only same-customer orders within the window") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.tpch.CoreOps.bandJoinOrders(spark, dir)
    val orders = out.select("o_custkey", "o_orderkey", "orderdate")
      .as[(Long, Long, java.sql.Date)].collect()
    assert(orders.length ==
      spark.read.parquet(s"$dir/orders.parquet").count())
    // brute-force one customer
    val custs = orders.groupBy(_._1).maxBy(_._2.length)._1
    val mine = orders.filter(_._1 == custs)
    val counts = out.filter(col("o_custkey") === custs)
      .select("o_orderkey", "nearby_orders")
      .as[(Long, Long)].collect().toMap
    for ((_, ok, od) <- mine) {
      val expect = mine.count { case (_, ok2, od2) =>
        val dayGap =
          math.abs(od.toLocalDate.toEpochDay - od2.toLocalDate.toEpochDay)
        ok2 != ok && dayGap <= 7
      }
      assert(counts(ok) == expect)
    }
  }

  test("cube emits leaf, both marginals, and grand total") {
    val out = graft.tpch.CoreOps.cubePricing(spark, "/root/testdata/sf0.001")
      .cache()
    val leaf = out.filter(col("l_returnflag").isNotNull &&
      col("l_linestatus").isNotNull).count()
    val m1 = out.filter(col("l_returnflag").isNotNull &&
      col("l_linestatus").isNull).count()
    val m2 = out.filter(col("l_returnflag").isNull &&
      col("l_linestatus").isNotNull).count()
    val total = out.filter(col("l_returnflag").isNull &&
      col("l_linestatus").isNull)
    assert(leaf > 0 && m1 > 0 && m2 > 0 && total.count() == 1)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert(total.select("n_items").as[Long].head() == li.count())
  }

  test("pivot columns equal the per-status counts") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.tpch.CoreOps.pivotOrderStatus(spark, dir)
    val byStatus = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_orderstatus").count()
      .as[(String, Long)].collect().toMap
    val sums = out.agg(sum("open_orders"), sum("finished_orders"),
      sum("partial_orders")).as[(Long, Long, Long)].head()
    assert(sums == ((byStatus("O"), byStatus("F"), byStatus("P"))))
  }

  test("sliding windows double-count every event; tumbling count once") {
    val dir = "/root/testdata/sf0.001"
    val total = graft.ingest.Events.raw(spark, dir).count()
    val tumbling = graft.ops.TimeWindows.tumblingHourly(spark, dir)
      .agg(sum("n_events")).as[Long].head()
    val sliding = graft.ops.TimeWindows.slidingHourly(spark, dir)
      .agg(sum("n_events")).as[Long].head()
    assert(tumbling == total && sliding == 2 * total)
    // sliding window starts are 30-minute aligned
    val misaligned = graft.ops.TimeWindows.slidingHourly(spark, dir)
      .filter(col("window_start_us") % (1800L * 1000000L) =!= 0).count()
    assert(misaligned == 0)
  }

  test("hash split is deterministic and roughly 80/10/10") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.text.TextOps.hashSplit(spark, dir).cache()
    val n = out.count()
    val bySplit = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.values.sum == n)
    assert(bySplit("train") > n / 2) // 80% nominal
    assert(bySplit.keySet == Set("train", "val", "test"))
    // rerun gives the identical assignment
    val again = graft.text.TextOps.hashSplit(spark, dir)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val first = out.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(again == first)
  }

  test("tf-idf: rare token outranks frequent one within a doc") {
    val dir = tmpDir("tfidf-docs")
    Seq(
      (0L, "common common common rare"),
      (1L, "common word"),
      (2L, "common another")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.text.TextOps.tfIdfTopTerms(spark, dir)
      .filter(col("doc_id") === 0L)
      .orderBy("rk")
      .select("token", "score_ppm")
      .as[(String, Long)].collect()
    // rare: tf=1, df=1, N=3 -> 3_000_000; common: tf=3, df=3 -> 3_000_000
    // tie broken by token name; both outrank nothing else in doc 0
    assert(out.map(_._1).toSet == Set("rare", "common"))
    assert(out.head._2 == 3000000L && out(1)._2 == 3000000L)
  }

  test("count-min estimates dominate exact counts and match when alone") {
    val dir = tmpDir("cm")
    // one hot token (12 instances) + filler; w=1024 makes a same-bucket
    // collision in ALL 4 rows effectively impossible for 6 tokens, so
    // the hot token's estimate must be exact
    Seq(
      (0L, "hot hot hot hot hot hot"),
      (1L, "hot hot hot hot hot hot"),
      (2L, "u1 u2 u3 u4 u5")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.text.TextOps.countMinTopTokens(spark, dir)
      .select("token", "exact_count", "cm_estimate", "bound_holds")
      .as[(String, Long, Long, Int)].collect()
    assert(out.length == 6)
    assert(out.forall(_._4 == 1), "CM must never under-count")
    assert(out.forall(r => r._3 >= r._2))
    val hot = out.find(_._1 == "hot").get
    assert(hot._2 == 12L && hot._3 == 12L)
  }

  test("tfIdfRetrieve ranks shingle overlap and prunes stopword postings") {
    val dir = tmpDir("tfidf-retrieve")
    // shingle "x y z" sits in 3 of 5 docs (df*2 > n) -> its postings
    // are pruned, so doc 2, sharing ONLY it with doc 0, must not be a
    // candidate; "a b c" (df=2) carries the real match
    Seq(
      (0L, "x y z a b c"),
      (1L, "x y z q a b c"),
      (2L, "x y z d e f"),
      (3L, "p q r s t u"),
      (4L, "m n o mm nn oo")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.text.TextOps.tfIdfRetrieve(spark, dir)
      .filter(col("query_id") === 0L)
      .orderBy("rank")
      .select("neighbor_id", "score", "rank")
      .as[(Long, Long, Int)].collect()
    // w("a b c") = (1*100*5) div 2 = 250 in both docs -> score 62500
    assert(out.toSeq == Seq((1L, 62500L, 1)), s"got ${out.toSeq}")
  }
}
