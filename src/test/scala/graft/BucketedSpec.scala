package graft

import graft.ingest.Events
import graft.runtime.Bucketed
import graft.silver.{Dedup, Sessionize}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The bucketed-layout contract: user-keyed aggregation and self-joins
  * over a bucketBy(user_id) silver table plan with ZERO shuffle exchanges
  * — the property that deletes the dominant per-gold-job shuffle at
  * 100 TB. */
class BucketedSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: ShuffleExchangeExec => s }.size
  }

  private lazy val table: String = {
    val sessions = Sessionize.sessions(
      Dedup.keepLatest(Events.cleansed(spark, "/root/testdata/sf0.001")))
    Bucketed.writeSilver(spark, "silver_bucketed_spec", sessions)
    "silver_bucketed_spec"
  }

  test("user-keyed aggregation over the bucketed table has no shuffle") {
    val agg = Bucketed.userDailyBase(spark, table)
    assert(agg.count() > 0)
    assert(shuffles(agg) == 0,
      "bucketed scan must satisfy the groupBy distribution:\n" +
        agg.queryExecution.executedPlan)
  }

  test("same-key self-join of the bucketed table has no shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketed.selfJoin(spark, table)
      assert(j.count() > 0)
      assert(shuffles(j) == 0,
        "bucket-aligned equi-join must not exchange either side:\n" +
          j.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      10L * 1024 * 1024)
  }

  test("bucketed result equals the unbucketed aggregate") {
    val bucketed = Bucketed.userDailyBase(spark, table)
    val plain = spark.table(table)
    val expected = plain
      .groupBy(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("datetime"))
      .agg(org.apache.spark.sql.functions
        .countDistinct("session_id").as("n_sessions"),
        org.apache.spark.sql.functions.sum("duration_ms")
          .as("total_duration_ms"),
        org.apache.spark.sql.functions.max("max_value_cents")
          .as("max_value_cents"))
    assert(bucketed.except(expected).isEmpty &&
      expected.except(bucketed).isEmpty)
  }

  test("country gold over the bucketed table: no RAW silver row crosses " +
      "a shuffle (every exchange input is pre-aggregated)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec}
    val gold = Bucketed.countryDaily(spark, table)
    assert(gold.count() > 0)
    val plan = gold.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // An exchange "sees raw rows" if walking down from it reaches the
    // silver scan without passing through an aggregate (window frames
    // re-partition pre-distinct rows, which the bucketed scan already
    // clusters — they plan with no exchange at all, as asserted by the
    // whole-plan walk).
    def seesRawScan(p: SparkPlan): Boolean = p match {
      case _: BaseAggregateExec => false
      case s: FileSourceScanExec => true
      case other => other.children.exists(seesRawScan)
    }
    val raw = plan.collect {
      case e: ShuffleExchangeExec if seesRawScan(e.child) => e
    }
    assert(raw.isEmpty,
      s"raw-silver shuffle found:\n$plan")
  }
}
