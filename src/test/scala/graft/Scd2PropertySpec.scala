package graft

import graft.runtime.{ChangeLog, Scd2Store}
import graft.silver.MergeUpsert
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adversarial property check for the whole log-history surface: a
  * DETERMINISTIC pseudo-random 10-batch history (seeded LCG — same
  * run every time, no flakiness) of upserts, value changes and
  * deletes over a small key space, against three independent
  * consumers of the same log:
  *
  *  - [[ChangeLog.snapshotAt]] must reproduce EVERY historical state;
  *  - [[graft.ops.Scd2]] intervals filtered to any position must
  *    reproduce the same states (the as-of contract, checked
  *    position-by-position);
  *  - the incrementally-maintained [[Scd2Store]] must equal the
  *    from-scratch rebuild at several mid-history checkpoints.
  *
  * The hand-written specs pin designed shapes (re-adds, transients,
  * reverts); this one walks shapes nobody designed. */
class Scd2PropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("m", LongType)))

  private def df(rows: Seq[(Long, Long)]): DataFrame =
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

  test("random 10-batch history: snapshotAt and the SCD2 as-of agree " +
      "with every historical state; the incremental store tracks the " +
      "rebuild") {
    var seed = 0x5EED5EED5EEDL
    def rnd(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % n + n) % n).toInt
    }
    val dir = tmpDir("scd2prop") + "/t"
    val store = tmpDir("scd2prop") + "/store"
    val keySpace = 6
    var state = Map(1L -> 100L, 2L -> 200L, 3L -> 300L) // batch-0 base
    val states = scala.collection.mutable.ArrayBuffer(state)

    MergeUpsert.replaceAll(spark, dir, df(state.toSeq),
      partitionCol = "pt")
    Scd2Store.refresh(spark, dir, store, Seq("id"), basePosition = 0L)

    for (b <- 1 to 10) {
      // 1-3 random mutations: delete if present (1 in 3), else upsert
      // a fresh value (which may re-add a removed key or change one).
      for (_ <- 0 to rnd(3)) {
        val k = rnd(keySpace) + 1L
        if (state.contains(k) && rnd(3) == 0) state -= k
        else state += k -> (b * 1000L + rnd(900))
      }
      states += state
      ChangeLog.recordBatch(spark, dir, Seq("id"), b.toLong)(
        MergeUpsert.replaceAll(spark, dir, df(state.toSeq),
          partitionCol = "pt"))
      if (b % 3 == 0) {
        Scd2Store.refresh(spark, dir, store, Seq("id"))
        assert(cells(Scd2Store.read(spark, store).drop("pt")) ===
          cells(ChangeLog.scd2(spark, dir, Seq("id"), 0L).drop("pt")),
          s"store != rebuild after batch $b")
      }
    }

    val scd = ChangeLog.scd2(spark, dir, Seq("id"), basePosition = 0L)
      .localCheckpoint()
    states.zipWithIndex.foreach { case (st, p) =>
      val expected = cells(df(st.toSeq).drop("pt"))
      assert(cells(ChangeLog.snapshotAt(spark, dir, Seq("id"),
          p.toLong).drop("pt")) === expected, s"snapshotAt($p)")
      val asOf = scd.filter(col("valid_from") <= p &&
          (col("valid_to").isNull || col("valid_to") > p))
        .select(col("id"), col("m"))
      assert(cells(asOf) === expected, s"scd2 as-of $p")
    }

    // Final catch-up: the store ends equal to the rebuild too.
    Scd2Store.refresh(spark, dir, store, Seq("id"))
    assert(cells(Scd2Store.read(spark, store).drop("pt")) ===
      cells(ChangeLog.scd2(spark, dir, Seq("id"), 0L).drop("pt")))
  }
}
