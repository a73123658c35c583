package graft

import graft.ops.TableDiff
import org.apache.spark.sql.functions._

/** Row-level semantics of the dataset diff: all four statuses, NULL
  * transitions counted as changes (both directions), additive schema
  * evolution ignored, and composition with time travel. */
class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private val old = Seq(
    (1L, Some("a"), 10),  // unchanged
    (2L, Some("b"), 20),  // value change
    (3L, Some("c"), 30),  // removed
    (4L, None: Option[String], 40), // NULL -> value
    (5L, Some("e"), 50)   // value -> NULL
  ).toDF("k", "s", "v")

  private val neu = Seq(
    (1L, Some("a"), 10),
    (2L, Some("B"), 20),
    (4L, Some("d"), 40),
    (5L, None: Option[String], 50),
    (6L, Some("f"), 60)   // added
  ).toDF("k", "s", "v")

  test("classifies all four statuses; NULL transitions are changes") {
    val d = TableDiff.diff(old, neu, Seq("k"))
      .select(col("k"), col("diff_status"), col("changed_cols"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getSeq[String](2).toList)).toMap
    assert(d(1L) == ("unchanged", Nil))
    assert(d(2L) == ("changed", List("s")))
    assert(d(3L)._1 == "removed")
    assert(d(4L) == ("changed", List("s")), "NULL -> value must change")
    assert(d(5L) == ("changed", List("s")), "value -> NULL must change")
    assert(d(6L)._1 == "added")
    assert(d.size == 6)
  }

  test("a column added by schema evolution does not flag every row") {
    val evolved = neu.withColumn("extra", lit(1))
    val d = TableDiff.diff(old, evolved, Seq("k"))
      .filter(col("k") === 1L).select(col("diff_status"))
      .collect().head.getString(0)
    assert(d == "unchanged",
      "one-sided columns must be excluded from the comparison")
  }

  test("summary buckets by status and first changed column") {
    val s = TableDiff.summary(old, neu, Seq("k"))
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(s(("changed", "s")) == 3L)
    assert(s(("unchanged", "none")) == 1L)
    assert(s.keys.count(_._1 == "added") == 1)
    assert(s.keys.count(_._1 == "removed") == 1)
  }

  test("model-based: diff agrees with a plain-Scala reference on " +
      "randomized snapshot pairs") {
    val rnd = new scala.util.Random(11L)
    for (round <- 0 until 3) {
      def snap() = (0 until 200).flatMap { k =>
        if (rnd.nextDouble() < 0.8)
          Some((k.toLong,
            if (rnd.nextDouble() < 0.1) None
            else Some(s"v${rnd.nextInt(3)}"),
            rnd.nextInt(2)))
        else None
      }
      val oldRows = snap()
      val neuRows = snap()
      val om = oldRows.map(r => r._1 -> (r._2, r._3)).toMap
      val nm = neuRows.map(r => r._1 -> (r._2, r._3)).toMap
      val expected = (om.keySet ++ nm.keySet).map { k =>
        k -> ((om.get(k), nm.get(k)) match {
          case (None, _)            => "added"
          case (_, None)            => "removed"
          case (Some(a), Some(b))   =>
            if (a == b) "unchanged" else "changed"
        })
      }.toMap
      val got = TableDiff.diff(oldRows.toDF("k", "s", "v"),
          neuRows.toDF("k", "s", "v"), Seq("k"))
        .select(col("k"), col("diff_status"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected, s"round $round diverged from the model")
    }
  }

  test("composes with readAsOf time travel: diff of two as-of views " +
      "is exactly the later batch's effect") {
    val dir = tmpDir("diff-asof")
    graft.runtime.Incremental.appendBatch(spark, dir,
      Seq((1L, "x"), (2L, "y")).toDF("k", "s"), 1L)
    graft.runtime.Incremental.appendBatch(spark, dir,
      Seq((2L, "Y"), (3L, "z")).toDF("k", "s"), 2L)
    // The consumer view of an append-only log: latest row per key.
    def latest(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("batch_id").desc)
      df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn", "batch_id")
    }
    val before = latest(graft.runtime.Incremental.readAsOf(spark, dir, 1L))
    val after = latest(graft.runtime.Incremental.readAsOf(spark, dir, 2L))
    val d = TableDiff.diff(before, after, Seq("k"))
      .select(col("k"), col("diff_status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "unchanged", 2L -> "changed", 3L -> "added"))
  }
}
