package graft

import graft.util.Skew
import org.apache.spark.sql.functions._

/** The skewed-join contract: the measured salt arm equals the plain
  * join row for row, and the hot key's fact rows genuinely SPLIT
  * across salt sub-keys — never one straggler task. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltsFor: enough ways to respect the cap, clamped to [2, Max]") {
    assert(Skew.saltsFor(100L, cap = 1000L) === 2) // below cap still splits
    assert(Skew.saltsFor(5000L, cap = 1000L) === 5)
    assert(Skew.saltsFor(Long.MaxValue / 4, cap = 1000L) === Skew.MaxSalts)
  }

  test("salted join == plain join on a 50%-hot fact, incl. dim dup keys") {
    val fact = (1L to 2000L).map { i =>
      (if (i % 2 == 0) -1L else i % 97L, i)
    }.toDF("jk", "v")
    // Dim with a DUPLICATE key (7 appears twice): every fact row of a
    // duplicated key must meet both dim rows, salted or not.
    val dim = ((-1L to 97L).map(k => (k, s"d$k")) :+ (7L, "d7b"))
      .toDF("jk", "name")
    val plain = fact.join(dim, Seq("jk"), "inner")
    val salted = Skew.saltedJoin(fact, dim, "jk", Seq(-1L, 7L), salts = 8)
    val cols = plain.columns.sorted.map(col).toSeq
    assert(salted.select(cols: _*).exceptAll(plain.select(cols: _*)).isEmpty
      && plain.select(cols: _*).exceptAll(salted.select(cols: _*)).isEmpty,
      "salted join diverged from the plain join")
  }

  test("the hot key's rows split across >1 salt partition") {
    val fact = (1L to 4096L).map(i => (-1L, i)).toDF("jk", "v")
    val salts = fact.withColumn("_salt",
        pmod(xxhash64(col("jk"), col("v")), lit(8L)))
      .select(col("_salt")).distinct().count()
    assert(salts > 1, "content-derived salt failed to spread the hot key")
    // End to end through saltedJoin: join output size proves each fact
    // row met its dim row exactly once despite the per-salt replicas.
    val dim = Seq((-1L, "hot")).toDF("jk", "name")
    assert(Skew.saltedJoin(fact, dim, "jk", Seq(-1L), 8).count() === 4096L)
  }

  test("measuredJoin arms: plain below the cap, salted above it") {
    val dim = Seq((-1L, "hot"), (5L, "cold")).toDF("jk", "name")
    val cold = (1L to 100L).map(i => (5L, i)).toDF("jk", "v")
    // Below cap: no hot key, plain inner join.
    assert(Skew.measuredJoin(cold, dim, "jk", cap = 1000L).count() === 100L)
    // Above cap: the hot key salts; result still row-identical.
    val hot = ((1L to 3000L).map(i => (-1L, i)) ++
      (1L to 10L).map(i => (5L, i))).toDF("jk", "v")
    val plain = hot.join(dim, Seq("jk"), "inner")
    val arm = Skew.measuredJoin(hot, dim, "jk", cap = 1000L)
    val cols = plain.columns.sorted.map(col).toSeq
    assert(arm.select(cols: _*).exceptAll(plain.select(cols: _*)).isEmpty &&
      plain.select(cols: _*).exceptAll(arm.select(cols: _*)).isEmpty)
  }

  test("under a shuffle join (broadcast off), salting spreads the hot " +
      "key across partitions where the plain join funnels one task") {
    // At harness scale the dim broadcasts and skew is moot (a
    // broadcast join never shuffles the fact by key — itself the
    // first-line skew answer); at 100 TB dims exceed the threshold
    // and the join shuffles by key — THE scenario salting exists for.
    // Reproduce it by disabling broadcast.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fact = (1L to 4096L).map(i => (-1L, i)).toDF("jk", "v")
      val dim = Seq((-1L, "hot"), (5L, "cold")).toDF("jk", "name")
      def partitionsUsed(df: org.apache.spark.sql.DataFrame): Long = df
        .withColumn("pid", spark_partition_id())
        .groupBy(col("pid")).count()
        .filter(col("count") > 0).count()
      // Plain shuffle join: every hot row lands in ONE partition — the
      // straggler task.
      assert(partitionsUsed(fact.join(dim, Seq("jk"), "inner")) === 1L)
      // Salted: the same rows spread over multiple (jk, salt)
      // partitions — no single task owns the hot key.
      assert(partitionsUsed(
        Skew.saltedJoin(fact, dim, "jk", Seq(-1L), 8)) > 1L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("a fact carrying a MAP column still measures and salts: the " +
      "content hash skips unhashable columns instead of failing") {
    // Spark refuses xxhash64 over MapType (iteration order), so the
    // old full-row hash failed at ANALYSIS time for any map-carrying
    // fact — even with no hot key. The hash now restricts to hashable
    // columns; rows differing only in the map share a salt, which can
    // only coarsen the spread, never the result.
    val fact = (1L to 3000L).map { i =>
      (if (i <= 2000L) -1L else i % 97L, i, Map("k" -> i))
    }.toDF("jk", "v", "m")
    val dim = (-1L to 97L).map(k => (k, s"d$k")).toDF("jk", "name")
    // exceptAll itself refuses maps, so compare on the scalar columns
    // (v is unique per row — the projection loses nothing).
    val plain = fact.join(dim, Seq("jk"), "inner")
      .select(col("jk"), col("v"), col("name"))
    val got = Skew.measuredJoin(fact, dim, "jk", cap = 500L)
      .select(col("jk"), col("v"), col("name"))
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty,
      "map-carrying measured join diverged from the plain join")
  }

  test("measuredJoin fails loud when the hot list explodes") {
    val fact = (1L to 2000L).map(i => (i % 100L, i)).toDF("jk", "v")
    val dim = (0L until 100L).map(k => (k, s"d$k")).toDF("jk", "name")
    intercept[IllegalArgumentException] {
      Skew.measuredJoin(fact, dim, "jk", cap = 1L, maxHotKeys = 10)
    }
  }

  test("a hot key of byte-identical duplicate rows escalates to the " +
      "broadcast-hot arm: == plain join, hot fact rows never shuffle") {
    // The degenerate regime: a constant-payload heartbeat — 4000
    // copies of ONE row. Every copy hashes to the same salt, so
    // salting could never split it; the broadcast arm joins the hot
    // rows where they sit (no shuffle ⇒ nothing to funnel).
    val dupFact = (1L to 4000L).map(_ => (-1L, 7L)).toDF("jk", "v")
      .repartition(8)
    val dim = Seq((-1L, "hot"), (5L, "cold")).toDF("jk", "name")
    val arm = Skew.measuredJoin(dupFact, dim, "jk", cap = 1000L)
    val plain = dupFact.join(dim, Seq("jk"), "inner")
    val cols = plain.columns.sorted.map(col).toSeq
    assert(arm.select(cols: _*).exceptAll(plain.select(cols: _*)).isEmpty
      && plain.select(cols: _*).exceptAll(arm.select(cols: _*)).isEmpty,
      "hybrid arm diverged from the plain join")
    // The hot rows really avoid the reducer funnel: even with
    // broadcast otherwise disabled, the hybrid plan's hot side is a
    // hinted broadcast join, so the output stays spread across the
    // fact's own partitions instead of one task.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val spread = Skew.hybridJoin(dupFact, dim, "jk", Seq(-1L))
        .withColumn("pid", spark_partition_id())
        .groupBy(col("pid")).count().filter(col("count") > 0).count()
      assert(spread > 1L,
        "hybrid hot side funneled into one partition")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    // A DIVERSE hot key at the same volume still takes the salt arm
    // (memory-flat, no broadcast).
    val diverse = (1L to 4000L).map(i => (-1L, i)).toDF("jk", "v")
    assert(Skew.measuredJoin(diverse, dim, "jk", cap = 1000L)
      .count() === 4000L)
  }

  test("volume past MaxSalts×cap takes the broadcast-hot arm; hot on " +
      "BOTH sides fails loud (no join arm bounds that)") {
    // cap=3 makes the salt ceiling MaxSalts×3 = 3072 rows — a
    // 4000-row diverse hot key is past ANY salt level, but its single
    // dim row broadcasts: hybrid arm, row-identical to the plain join.
    val fact = (1L to 4000L).map(i => (-1L, i)).toDF("jk", "v")
    val dim = Seq((-1L, "hot")).toDF("jk", "name")
    assert(Skew.measuredJoin(fact, dim, "jk", cap = 3L)
      .count() === 4000L)
    // Both sides hot: the dim carries more hot rows than the
    // broadcast budget — refuse, with the remedy in the message.
    val fatDim = (1L to 20L).map(i => (-1L, s"d$i")).toDF("jk", "name")
    val e = intercept[IllegalArgumentException] {
      Skew.measuredJoin(fact, fatDim, "jk", cap = 3L,
        maxDimHotRows = 10L)
    }
    assert(e.getMessage.contains("BOTH sides"))
  }
}
