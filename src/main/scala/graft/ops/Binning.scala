package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact equi-depth (equal-frequency) binning — the feature
  * discretization a training pipeline runs before bucketized embeddings
  * or monotonic-feature models, done EXACTLY without the global-sort
  * anti-pattern.
  *
  * The naive formulation is `ntile(k) OVER (ORDER BY price)` — a
  * partition-less window that drags the entire table through ONE task
  * (the shape PlanSpec bans). The textbook approximation is
  * `approx_percentile` edges — not oracle-exact and rank-error bounded
  * only probabilistically. This operator computes the EXACT global rank
  * with a two-level distributed prefix sum instead:
  *
  *  1. one narrow scan computes (lo, hi, n) of the value domain;
  *  2. rows map to [[FanOut]] value-range strata (a pure function of the
  *     value — no shuffle);
  *  3. ONE aggregation counts rows per stratum — ≤ [[FanOut]] rows
  *     collect to the driver (metadata-scale), whose running sum gives
  *     each stratum's global rank OFFSET, broadcast back;
  *  4. a `row_number` window PARTITIONED BY stratum (state: one
  *     stratum's rows, ~n/[[FanOut]] expected) plus the offset is the
  *     exact global rank; `bin = (rank-1)·k div n` assigns equi-depth
  *     bins whose sizes differ by at most one row.
  *
  * Ties are broken by (l_orderkey, l_linenumber), making the rank — and
  * therefore every bin boundary — fully deterministic; the DuckDB oracle
  * replays the identical total order with one `row_number` window and
  * must match cell-for-cell. Rank arithmetic is integer; per-bin sums
  * are exact cent BIGINTs (a double sum would be accumulation-order
  * dependent across engines).
  *
  * Scale note: stratum width is value-range uniform, so a pathological
  * corpus concentrating mass on one value sends that value's rows to one
  * stratum's window partition (bounded by the duplication count of a
  * single value, not by n). The mitigation at 100 TB is raising
  * [[FanOut]] or seeding strata from a quantile sketch; the two-level
  * shape — and the metadata-scale driver state — is unchanged either
  * way.
  */
object Binning {

  /** Value-range strata for the level-1 prefix sum. 1024 strata × ~20
    * bytes collects ~20 KB to the driver at ANY corpus size. */
  val FanOut = 1024

  /** Exact equi-depth bins of lineitem extended price: one row per bin
    * with its row count, value span, and exact cent sum. */
  def equiDepthBins(spark: SparkSession, dir: String,
                    k: Int = 10): DataFrame =
    equiDepthBinsOf(
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_extendedprice").as("price"),
          col("l_orderkey"), col("l_linenumber")), k)

  /** Pure form over any (price double, l_orderkey, l_linenumber) frame —
    * the tiebreak columns complete the total order. */
  def equiDepthBinsOf(rows0: DataFrame, k: Int): DataFrame = {
    val spark = rows0.sparkSession
    val li = rows0.filter(col("price").isNotNull)
    val stats = li.agg(min(col("price")), max(col("price")),
      count(lit(1))).head()
    val n = stats.getLong(2)
    if (n == 0L) {
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bin",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_rows",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("price_lo",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("price_hi",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("cents_sum",
            org.apache.spark.sql.types.LongType))))
    }
    val lo = stats.getDouble(0)
    val hi = stats.getDouble(1)
    // Stratum id: pure value function, mirrored nowhere (internal to the
    // rank — the oracle ranks directly). Degenerate one-value domain →
    // a single stratum (its window is the whole frame, but so is the
    // domain: nothing to stratify).
    val strat =
      if (hi == lo) lit(0L)
      else least(floor(((col("price") - lit(lo)) / lit(hi - lo))
        * lit(FanOut)).cast("long"), lit(FanOut - 1L))
    val rows = li.withColumn("strat", strat)
    // Level 1: per-stratum counts → driver running sum → rank offsets.
    val counts = rows.groupBy(col("strat"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (s, c) =>
      val o = acc; acc += c; (s, o)
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("strat", "off")
    // Level 2: within-stratum rank + offset = exact global rank. The
    // stratum id is monotone in price, so (strat, price, tiebreak)
    // orders identically to the oracle's flat (price, tiebreak).
    val w = Window.partitionBy(col("strat"))
      .orderBy(col("price"), col("l_orderkey"), col("l_linenumber"))
    rows.join(broadcast(offDf), Seq("strat"))
      .withColumn("rk", row_number().over(w).cast("long") + col("off"))
      .withColumn("bin", expr(s"((rk - 1) * $k) div ${n}L"))
      .withColumn("cents",
        expr("CAST(round(price * 100, 0) AS BIGINT)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("price")).as("price_lo"),
        max(col("price")).as("price_hi"),
        sum(col("cents")).as("cents_sum"))
  }
}
