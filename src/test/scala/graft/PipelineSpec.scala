package graft

import graft.runtime.Pipeline
import org.apache.spark.sql.functions._

/** End-to-end chain on sf0.001: silver merge-upsert, gate, five gold
  * tables in reference dependency order; rerun idempotency. */
class PipelineSpec extends SparkSpec {

  test("daily chain produces all six tables and is rerun-idempotent") {
    val wh = tmpDir("warehouse")
    val res = Pipeline.runDaily(spark, "/root/testdata/sf0.001", wh)
    assert(res.map(_.table) == Seq("silver_sessions", "gold_user_daily",
      "gold_episode_daily", "gold_webtoon_daily",
      "gold_platform_device_daily", "gold_country_daily"))
    assert(res.forall(_.rows > 0))
    // gold→gold dependency: webtoon deepest episode comes from episode gold
    val wt = spark.read.parquet(s"$wh/gold_webtoon_daily")
    assert(wt.filter(col("deepest_episode_id") =!= "none").count() > 0)
    // rerun: merge-upsert + partition overwrite are idempotent
    val res2 = Pipeline.runDaily(spark, "/root/testdata/sf0.001", wh)
    assert(res.map(r => r.table -> r.rows).toMap ==
      res2.map(r => r.table -> r.rows).toMap)
  }

  test("failure callback fires and propagates") {
    var failed: Option[String] = None
    intercept[Throwable] {
      Pipeline.runDaily(spark, "/nonexistent-input", tmpDir("wh2"),
        onFailure = (stage, _) => failed = Some(stage))
    }
    assert(failed.contains("silver"))
  }
}
