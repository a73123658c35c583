package graft

import graft.runtime.ChangeLog
import graft.silver.MergeUpsert
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SCD Type-2 from the change log ([[graft.ops.Scd2]] via
  * [[ChangeLog.scd2]]): every version-interval shape the event
  * algebra must get right — the untouched baseline (open since base,
  * still current), a changed key's chain, tombstone closes from
  * removals, remove-then-readd (two disjoint intervals), an
  * added-then-removed transient, and a key that existed at base but
  * was only ever removed. Then the property the structure exists for:
  * filtering the intervals to any position reconstructs that
  * position's snapshot exactly — the as-of dimension-read contract. */
class Scd2Spec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("m", LongType)))

  private def df(rows: (Long, Long)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2)), 2), schema)
      .withColumn("pt", lit("all"))

  private def cells(d: DataFrame): Seq[Seq[String]] = {
    val cols = d.columns.sorted
    d.select(cols.map(col): _*).collect()
      .map(r => cols.indices.map(i => String.valueOf(r.get(i))).toSeq)
      .toSeq.sortBy(_.mkString("|"))
  }

  // The history: id1 untouched; id2 changed at b2; id3 removed at b1,
  // re-added at b3; id4 removed at b2 (baseline, only-ever-removed);
  // id5 added at b1, changed at b3; id6 added at b3; id7 added at b1,
  // removed at b2 (transient).
  private val s0 = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
  private val s1 = Seq((1L, 10L), (2L, 20L), (4L, 40L), (5L, 50L),
    (7L, 70L))
  private val s2 = Seq((1L, 10L), (2L, 21L), (5L, 50L))
  private val s3 = Seq((1L, 10L), (2L, 21L), (3L, 31L), (5L, 55L),
    (6L, 60L))
  private val states = Seq(s0, s1, s2, s3)

  private def buildHistory(dir: String): Unit = {
    MergeUpsert.replaceAll(spark, dir, df(s0: _*), partitionCol = "pt")
    Seq(s1, s2, s3).zipWithIndex.foreach { case (st, i) =>
      ChangeLog.recordBatch(spark, dir, Seq("id"), i + 1L)(
        MergeUpsert.replaceAll(spark, dir, df(st: _*),
          partitionCol = "pt"))
    }
  }

  test("intervals: baseline, change chains, tombstones, re-adds and " +
      "transients land exactly; as-of filter reconstructs every state") {
    val dir = tmpDir("scd2") + "/t"
    buildHistory(dir)
    val scd = ChangeLog.scd2(spark, dir, Seq("id"), basePosition = 0L)
      .localCheckpoint()

    val expected = Seq(
      // (id, m, valid_from, valid_to, is_current)
      (1L, 10L, 0L, null, true), // untouched baseline
      (2L, 20L, 0L, 2L, false), (2L, 21L, 2L, null, true), // change
      (3L, 30L, 0L, 1L, false), (3L, 31L, 3L, null, true), // re-add
      (4L, 40L, 0L, 2L, false), // only-ever-removed baseline
      (5L, 50L, 1L, 3L, false), (5L, 55L, 3L, null, true), // add+change
      (6L, 60L, 3L, null, true), // late add
      (7L, 70L, 1L, 2L, false)) // transient
    val exp = spark.createDataFrame(
      spark.sparkContext.parallelize(expected.map(e =>
        Row(e._1, e._2, e._3, e._4, e._5)), 2),
      StructType(Seq(
        StructField("id", LongType), StructField("m", LongType),
        StructField("valid_from", LongType),
        StructField("valid_to", LongType),
        StructField("is_current", BooleanType))))
    assert(cells(scd.drop("pt")) === cells(exp), "interval set")

    // As-of reconstruction: intervals containing position p == state p.
    states.zipWithIndex.foreach { case (st, p) =>
      val asOf = scd
        .filter(col("valid_from") <= p &&
          (col("valid_to").isNull || col("valid_to") > p))
        .select(col("id"), col("m"))
      assert(cells(asOf) === cells(df(st: _*).drop("pt")), s"as-of $p")
    }
  }

  test("joinAsOf attaches each fact's position-correct image, NULL " +
      "for absent keys — never the naive last-version carry") {
    val dir = tmpDir("scd2-asof") + "/t"
    buildHistory(dir)
    val dim = ChangeLog.scd2(spark, dir, Seq("id"), basePosition = 0L)
      .select(col("id"), col("m").as("dim_m"), col("valid_from"),
        col("valid_to"))
    val allIds = (1L to 7L)
    val facts = spark.createDataFrame(
      spark.sparkContext.parallelize(
        for { id <- allIds; p <- 0L to 3L } yield Row(id, p), 2),
      StructType(Seq(StructField("id", LongType),
        StructField("pos", LongType))))
    val joined = graft.ops.Scd2
      .joinAsOf(facts, dim, Seq("id"), "pos")
      .select(col("id"), col("pos"), col("dim_m"))
    // Ground truth straight from the states, no interval bookkeeping.
    val expected = states.zipWithIndex.flatMap { case (st, p) =>
      val m = st.toMap
      allIds.map(id => (id, p.toLong, m.get(id)))
    }
    val got = joined.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got === expected.toSet)
    // The case the naive carry gets wrong: id7 removed at b2 must be
    // absent at positions 2 and 3, not stuck at its last image.
    assert(got.contains((7L, 2L, None)) && got.contains((7L, 3L, None)))
    // And a pre-add probe: id5 did not exist at position 0.
    assert(got.contains((5L, 0L, None)))
  }

  test("basePosition at or past a live entry fails loud") {
    val dir = tmpDir("scd2-guard") + "/t"
    buildHistory(dir)
    val e = intercept[RuntimeException](
      ChangeLog.scd2(spark, dir, Seq("id"), basePosition = 1L))
    assert(e.getMessage.contains("not below the lowest live log entry"))
  }

  test("no change log fails loud with the remedy named") {
    val dir = tmpDir("scd2-nolog") + "/t"
    MergeUpsert.replaceAll(spark, dir, df(s0: _*), partitionCol = "pt")
    val e = intercept[RuntimeException](
      ChangeLog.scd2(spark, dir, Seq("id"), basePosition = 0L))
    assert(e.getMessage.contains("enable CDC"))
  }
}
