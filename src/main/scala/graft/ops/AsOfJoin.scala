package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join: for every left row, attach the latest right row with
  * `right.tsCol <= left.tsCol` under equal keys (the classic event-
  * attribution / point-in-time-lookup operator; DuckDB spells it
  * `ASOF JOIN`, which is exactly the oracle used to verify it).
  *
  * Spark has no built-in as-of join. The naive encodings both fail at
  * scale: a range join explodes to O(|L|·|R|) per key, and a
  * "max-timestamp-then-self-join" recomputes the right side twice. The
  * scalable pattern used here is union + single partitioned sort:
  * tag both sides, union them, and run ONE window pass per key ordered by
  * (ts, side) carrying the right-side payload forward with
  * `last(ignoreNulls)`. One shuffle on the key, linear work, no
  * row explosion — the same plan Flink/kdb-style as-of joins lower to.
  *
  * Tie semantics: a right row at exactly the left timestamp IS matched
  * (side 0 sorts before side 1), mirroring ASOF JOIN's `>=`. Right rows
  * must be unique per (keys, ts) — pre-aggregate duplicates first, which
  * also makes the result deterministic.
  *
  * The right payload is carried as ONE struct column, not per-column
  * `last(ignoreNulls)` calls: a right row may legitimately hold NULL in
  * one payload field, and independent carries would fill that field from
  * an older row while the others come from the latest — a torn row. The
  * struct itself is only NULL on left-side markers, so `last(ignoreNulls)`
  * always lands on a whole right row (NULL fields included), matching
  * DuckDB ASOF JOIN.
  */
object AsOfJoin {

  /** @param left     left rows; all columns pass through
    * @param right    right rows: keys ++ tsCol ++ payload (payload and ts
    *                 column names must not collide with left's)
    * @param keys     equi-join key columns (same names on both sides)
    * @param leftTs   left timestamp column name
    * @param rightTs  right timestamp column name
    * @return left rows + right payload columns (+ rightTs), null when no
    *         right row is at or before the left timestamp
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String): DataFrame = {
    val carried = right.columns.filterNot(keys.contains).toSeq // incl rightTs
    val leftOnly = left.columns.filterNot(keys.contains).toSeq
    def typed(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType).as(c)
    val payloadType =
      org.apache.spark.sql.types.StructType(carried.map(right.schema(_)))

    val l2 = left
      .select(keys.map(col) ++ Seq(col(leftTs).as("__t"), lit(1).as("__side"))
        ++ leftOnly.map(col)
        :+ lit(null).cast(payloadType).as("__r"): _*)
    val r2 = right
      .select(keys.map(col) ++ Seq(col(rightTs).as("__t"), lit(0).as("__side"))
        ++ leftOnly.map(typed(left, _))
        :+ struct(carried.map(col): _*).as("__r"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .select(keys.map(col) ++ Seq(col("__t"), col("__side"))
        ++ leftOnly.map(col)
        :+ last(col("__r"), ignoreNulls = true).over(w).as("__r"): _*)
      .filter(col("__side") === 1)
      .select(keys.map(col) ++ leftOnly.map(col)
        ++ carried.map(c => col("__r").getField(c).as(c)): _*)
  }

  /** Registered query: last-view-before-purchase attribution over the
    * events table — every purchase joined as-of to the user's most recent
    * view at or before it. Views are pre-aggregated to one row per
    * (user_id, ts) keeping the max event_id, so the match is unique and
    * deterministic. Oracle: DuckDB native `ASOF LEFT JOIN`
    * (OpsOracles.asOfAttribution). */
  def attribution(spark: org.apache.spark.sql.SparkSession,
                  dir: String): DataFrame = {
    val e = graft.ingest.Events.raw(spark, dir)
      .transform(graft.ingest.Events.withTsUs)
      .withColumn("value_cents",
        expr("try_cast(round(value * 100, 0) as bigint)"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event_id"),
        col("ts_us").as("purchase_ts_us"), col("value_cents"))
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts_us").as("last_view_ts_us"))
      .agg(max(col("event_id")).as("last_view_event_id"))
      .select("user_id", "last_view_ts_us", "last_view_event_id")
    asOf(purchases, views, Seq("user_id"),
      "purchase_ts_us", "last_view_ts_us")
      .withColumn("view_to_purchase_us",
        col("purchase_ts_us") - col("last_view_ts_us"))
      .select("user_id", "purchase_event_id", "purchase_ts_us",
        "value_cents", "last_view_event_id", "last_view_ts_us",
        "view_to_purchase_us")
  }
}
