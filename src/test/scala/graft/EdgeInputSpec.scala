package graft

import org.apache.spark.sql.functions._

/** Degenerate-input robustness for the round's new operators: an empty
  * (or fully-filtered) corpus must yield an empty, correctly-typed
  * frame — never a driver exception — the PageRank n==0 convention. */
class EdgeInputSpec extends SparkSpec {

  // A harness-shaped dir whose tables are schema-correct but EMPTY.
  private lazy val dir = {
    val d = tmpDir("empty-corpus")
    val src = "/root/testdata/sf0.001"
    for (t <- Seq("events", "embeddings", "documents"))
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    d
  }

  test("gapfill on an empty corpus is an empty frame") {
    val out = graft.ops.TimeWindows.gapfillHourly(spark, dir)
    assert(out.columns.contains("locf_sum_cents"))
    assert(out.count() == 0L)
  }

  test("interval-overlap join on an empty corpus is an empty frame " +
      "under every arm") {
    for (arm <- Seq(graft.ops.IntervalJoin.AutoArm,
        graft.ops.IntervalJoin.ColdArm, graft.ops.IntervalJoin.SaltArm))
      assert(graft.ops.IntervalJoin
        .concurrentSessions(spark, dir, arm).count() == 0L, arm.toString)
  }

  test("1-NN eval on an empty corpus is an empty frame under every arm") {
    for (arm <- Seq(graft.sim.KnnEval.AutoArm, graft.sim.KnnEval.BruteArm,
        graft.sim.KnnEval.IvfArm)) {
      // IvfArm needs nlist pinned: sqrt(0) would floor to the minimum
      // anyway, but the empty frame must flow through training too.
      val out = graft.sim.KnnEval.labelAccuracy(spark, dir, arm,
        nprobe = 2, nlist = 2)
      assert(out.count() == 0L, arm.toString)
    }
  }

  test("reachability on an empty corpus and on an empty edge frame") {
    import spark.implicits._
    assert(graft.ops.Reachability.episodeReachability(spark, dir)
      .count() == 0L)
    assert(graft.ops.Reachability.reachability(spark,
      Seq.empty[(String, String)].toDF("src", "dst")).count() == 0L)
  }
}
