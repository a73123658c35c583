package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-version diff (the CDC shape): given two snapshots of a
  * keyed table, classify every key as `added` / `removed` / `changed` /
  * `unchanged` and name the changed columns — what a training-data
  * pipeline runs between dataset versions before shipping a delta
  * (which shards re-tokenize, which documents re-embed), and the
  * reconciliation report every migration ends with. Composes with
  * [[graft.runtime.Incremental.readAsOf]]: diff two as-of reads and
  * you have time-travel CDC over any merge-maintained table.
  *
  * Scale shape: ONE full-outer equi-join on the key — both sides
  * shuffle-partition by the same key (or the smaller side broadcasts
  * under AQE), so the diff is embarrassingly parallel and never
  * collects. Column comparison is null-safe (`<=>`), so NULL→value and
  * value→NULL both count as changes; the per-row output carries the
  * changed-column NAMES (array, filtered from a static list — bounded
  * by schema width, never by data) so a consumer can route deltas
  * per-field without a second pass. */
object TableDiff {

  /** Row-level diff of `old` vs `neu` on `keys`. Non-key columns are
    * the intersection of the two schemas; columns present on one side
    * only are ignored (schema evolution is additive here — a diff that
    * flagged every row "changed" because a column appeared would be
    * noise, and the ADDED column is visible in the schema itself).
    * Both inputs must be SNAPSHOTS — at most one row per key (an
    * append-only log needs its latest-per-key view taken first, see
    * TableDiffSpec's readAsOf composition); duplicate keys would
    * cross-join inside the full outer and classify every pairing. */
  def diff(old: DataFrame, neu: DataFrame,
           keys: Seq[String]): DataFrame = {
    val common = old.columns.toSeq.intersect(neu.columns.toSeq)
    val vals = common.filterNot(keys.contains)
    // The o_/n_ prefixes and the presence markers live in the same
    // namespace as the data columns — collide loudly, not silently
    // (a table carrying both `x` and `o_x` would otherwise produce an
    // ambiguous column and misclassify).
    val reserved = vals.map("o_" + _) ++ vals.map("n_" + _) ++
      Seq("_o", "_n")
    require(common.intersect(reserved).isEmpty,
      s"diff reserved-name collision: ${common.intersect(reserved)}")
    val o = old.select(common.map(col): _*)
      .withColumn("_o", lit(true))
    val n = neu.select(common.map(col): _*)
      .withColumn("_n", lit(true))
    // One co-partitioned full outer join; the o_/n_ prefixes keep both
    // sides' values addressable after it.
    val joined = o.select(keys.map(col) ++
        vals.map(c => col(c).as(s"o_$c")) :+ col("_o"): _*)
      .join(n.select(keys.map(col) ++
        vals.map(c => col(c).as(s"n_$c")) :+ col("_n"): _*),
        keys, "full_outer")
    val changedCols: Column =
      if (vals.isEmpty) array()
      else filter(
        array(vals.map(c =>
          when(!(col(s"o_$c") <=> col(s"n_$c")), lit(c))): _*),
        x => x.isNotNull)
    joined
      .withColumn("changed_cols", changedCols)
      .withColumn("diff_status",
        when(col("_o").isNull, "added")
          .when(col("_n").isNull, "removed")
          .when(size(col("changed_cols")) > 0, "changed")
          .otherwise("unchanged"))
      .drop("_o", "_n")
  }

  /** The reconciliation report: status × first-changed-column counts —
    * the metadata-scale summary a pipeline gates on (added within
    * expectation? removals zero? which field churned?). */
  def summary(old: DataFrame, neu: DataFrame,
              keys: Seq[String]): DataFrame =
    diff(old, neu, keys)
      // get(), not getItem(0): unchanged rows carry an EMPTY array and
      // ANSI mode makes an out-of-bounds index an error, not a NULL.
      .groupBy(col("diff_status"),
        coalesce(get(col("changed_cols"), lit(0)), lit("none"))
          .as("first_changed_col"))
      .agg(count(lit(1)).as("n_rows"))

  /** Registered face: diff the orders table against its own
    * next-quarter self — "the dataset before and after a quarter of
    * ingest" derived deterministically from one harness table (old =
    * orders before 1997-10-01; new = orders before 1998-01-01 with
    * Q3-1997 LOW orders' priority normalized — so all four statuses
    * appear: Q4 rows are `added`, rows re-prioritized are `changed`,
    * and a removed slice comes from dropping NOT-SPECIFIED September
    * orders). Output is the per-status/per-column summary plus a
    * deterministic per-status key fingerprint (min/max orderkey), so
    * the oracle verifies the row-level classification without hashing
    * the full diff. */
  def ordersQuarterDiff(s: SparkSession, dir: String): DataFrame = {
    val orders = s.read.parquet(s"$dir/orders.parquet")
    val old = orders
      .filter(col("o_orderdate") < expr("timestamp'1997-10-01 00:00:00'"))
    val neu = orders
      .filter(col("o_orderdate") < expr("timestamp'1998-01-01 00:00:00'"))
      .filter(!(col("o_orderpriority") === "4-NOT SPECIFIED" &&
        col("o_orderdate") >= expr("timestamp'1997-09-01 00:00:00'") &&
        col("o_orderdate") < expr("timestamp'1997-10-01 00:00:00'")))
      .withColumn("o_orderpriority",
        when(col("o_orderdate") >= expr("timestamp'1997-07-01 00:00:00'") &&
          col("o_orderdate") < expr("timestamp'1997-10-01 00:00:00'") &&
          col("o_orderpriority") === "5-LOW", lit("3-MEDIUM"))
          .otherwise(col("o_orderpriority")))
    diff(old, neu, Seq("o_orderkey"))
      .groupBy(col("diff_status"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        sum(size(col("changed_cols"))).as("n_changed_cells"))
  }
}
