package graft.tpch

import graft.util.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregate-surface extensions the core battery doesn't reach:
  * ordered string aggregation (LISTAGG), wide→long reshape (UNPIVOT),
  * and bivariate statistics (correlation / least-squares regression)
  * computed the cross-engine-exact way.
  *
  * The statistics queries deliberately do NOT call the built-in
  * `corr`/`regr_slope` aggregates: those accumulate floating-point
  * moments whose value depends on partial-aggregation order, so two
  * runs (or two engines) can round differently. Instead the five
  * sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are summed as
  * EXACT integers — order-independent by construction — and the float
  * formula is applied once to the exact sums, identically in both
  * engines ([[Num]] rule).
  */
object AggExtOps {

  private def read(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** LISTAGG / ordered string aggregation: per market segment, the
    * sorted distinct list of nations its customers come from. The
    * WITHIN GROUP ordering is what makes a string aggregate
    * deterministic at all — an unordered listagg is nondeterministic
    * under ANY parallel execution, so an ordered form is the only one
    * a distributed engine should ever expose. Catalyst's ListAgg sorts
    * each group's collected buffer once at evaluation (the buffer here
    * is ≤25 distinct nations per segment — group-bounded, not
    * row-bounded, so the aggregate state stays metadata-scale at any
    * fact size).
    *
    * The duplicate-elimination happens in a pre-distinct SUBQUERY, not
    * as DISTINCT aggregates: two distinct aggregates in one SELECT
    * (`listagg(DISTINCT ...)` + `count(DISTINCT ...)`) route through
    * the Expand-based RewriteDistinctAggregates, which (Spark 4.1)
    * drops ListAgg's WITHIN-GROUP SortOrder on the rewritten branch
    * and fails planning (`AttributeReference cannot be cast to
    * SortOrder`). After the pre-distinct both aggregates are plain, so
    * they plan the ordinary two-stage way — and `count(1)` counts the
    * distinct GROUP MEMBERS, not delimiter occurrences, so a delimiter
    * character inside a member name cannot inflate the count
    * (AggExtSpec plants one). */
  def listAggNationsFrom(s: SparkSession, customer: DataFrame,
                         nation: DataFrame): DataFrame = {
    customer.createOrReplaceTempView("agx_customer")
    nation.createOrReplaceTempView("agx_nation")
    s.sql(
      """SELECT segment,
        |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
        |  cast(count(1) as bigint) AS n_nations
        |FROM (
        |  SELECT DISTINCT c.c_mktsegment AS segment, n.n_name
        |  FROM agx_customer c
        |  JOIN agx_nation n ON n.n_nationkey = c.c_nationkey)
        |GROUP BY segment""".stripMargin)
  }

  def listAggNations(s: SparkSession, dir: String): DataFrame =
    listAggNationsFrom(s, read(s, dir, "customer"), read(s, dir, "nation"))

  /** UNPIVOT / wide→long reshape: the Q1-style pricing summary melted
    * into (flag, metric, value) rows — the shape every metrics store
    * and chart layer wants. The reshape is a zero-shuffle LOCAL
    * Expand (each input row emits one row per metric column), so it
    * composes with the upstream aggregate without adding an exchange;
    * all melted values share one BIGINT type (the UNPIVOT contract). */
  def unpivotPricing(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(expr("cast(round(l_quantity, 0) as bigint)")).as("sum_qty"),
        sum(expr("cast(round(l_extendedprice * 100, 0) as bigint)"))
          .as("base_cents"),
        count(lit(1)).as("n_items"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("base_cents"), col("n_items")),
        "metric", "value")

  /** Exact-integer bivariate statistics: per return flag, the Pearson
    * correlation and least-squares line of extended price (whole
    * dollars) against quantity. Sufficient statistics are exact bigint
    * sums (one map-side-combined aggregate, order-independent); the
    * closed-form float math runs once per group on those exact values,
    * so both engines execute the identical IEEE tree — sqrt and
    * division are correctly-rounded IEEE ops, deterministic
    * cross-engine, which `corr()`'s streaming moments are not.
    *
    * Scale note: the bigint sums bound the harness domain (Σy² ≤
    * ~1.5×10¹⁵ at sf0.1, within the 2⁵³ exact-double range). At true
    * 100 TB row counts the y² sum needs DECIMAL(38,0) or pre-centered
    * values — the technique is unchanged, only the accumulator
    * widens. */
  def corrRegression(s: SparkSession, dir: String): DataFrame = {
    val x = expr("cast(round(l_quantity, 0) as bigint)")
    val y = expr("cast(round(l_extendedprice, 0) as bigint)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    read(s, dir, "lineitem")
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(
        col("l_returnflag"), col("n"),
        Num.r((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
            sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))),
          6).as("corr_qty_price"),
        Num.r((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))),
          6).as("slope"),
        Num.r((d(col("sy")) -
          (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
            (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
            d(col("sx"))) / d(col("n")), 6).as("intercept"))
  }
}
