package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table operators beyond the windowing family: semi-structured
  * (JSON) property extraction and time-range window frames — both staples
  * of a feature pipeline that the reference sidesteps (its producer emits
  * a fixed flat schema; props-style JSON payloads are the general case).
  */
object EventOps {

  /** Semi-structured extraction + aggregation: pull `k` out of the JSON
    * `props` column and aggregate by (event_type, k mod 10). The JSON
    * path evaluation (`get_json_object`) is codegen'd and narrow — the
    * only shuffle is the final coarse-keyed aggregate, so at scale this
    * is one pass over the scan with the extraction fused into it. */
  def jsonPropsAgg(spark: SparkSession, dir: String): DataFrame =
    graft.ingest.Events.raw(spark, dir)
      .withColumn("k",
        get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("value_cents",
        expr("cast(round(value * 100, 0) as bigint)"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value_cents")).as("sum_value_cents"))

  /** Trailing-7-day per-user purchase spend, one row per purchase: a
    * RANGE window frame over integer µs event time (rowsBetween counts
    * rows; rangeBetween bounds the ORDER BY value — the only way to
    * express "last 7 days" when event density varies). RANGE frames
    * include all ties of the current timestamp, so the result is
    * deterministic even under duplicate timestamps. One shuffle on
    * user_id; the frame is evaluated with a sliding aggregate, not
    * per-row rescans. */
  def rolling7dSpend(spark: SparkSession, dir: String): DataFrame = {
    val sevenDaysUs = 7L * 24 * 3600 * 1000000
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-sevenDaysUs, 0)
    graft.ingest.Events.raw(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("value_cents",
        expr("cast(round(value * 100, 0) as bigint)"))
      .withColumn("spend_7d_cents", sum(col("value_cents")).over(w))
      .withColumn("n_purchases_7d", count(lit(1)).over(w))
      .select("user_id", "event_id", "ts_us", "value_cents",
        "spend_7d_cents", "n_purchases_7d")
  }
}
