package graft.tpch

import graft.util.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-topology shapes the core battery doesn't exercise: the
  * predicate-carrying LEFT OUTER + double aggregation of TPC-H Q13 and
  * the region-filtered 7-relation market-share join of TPC-H Q8 —
  * the two query skeletons (histogram-of-join-fanout and
  * share-of-a-slice) every BI workload rediscovers.
  *
  * Money follows the [[CoreOps]] integer-cents rule; ratios follow
  * [[Num]] so both engines execute the identical IEEE tree.
  */
object JoinOps {

  private def read(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  private def cents(c: String): org.apache.spark.sql.Column =
    expr(s"cast(round($c * 100, 0) as bigint)")

  /** TPC-H Q13 shape: distribution of order counts per customer, with
    * the disqualifying predicate ON THE JOIN CONDITION (not a WHERE —
    * a WHERE would turn the outer join inner and silently drop the
    * zero-order customers the histogram exists to show). The harness
    * orders carry no comment column, so the original NOT LIKE becomes
    * `o_orderpriority <> '1-URGENT'`. Two aggregations: per-customer
    * `count(o_orderkey)` (counts only MATCHED rows — the
    * nullable-count outer-join semantics under test), then the
    * count-of-counts histogram. At scale: one shuffled outer join on
    * the customer key, two map-side-combined aggregates; the second
    * agg's domain is tiny (distinct order counts), so the histogram
    * shuffle is metadata-scale. */
  def q13OrderDistribution(s: SparkSession, dir: String): DataFrame = {
    val cust = read(s, dir, "customer").select(col("c_custkey"))
    val ord = read(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    cust
      .join(ord,
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT",
        "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q8 shape: a nation's market share inside one region's
    * market for one part type, by order year — the widest join in the
    * battery (lineitem ⋈ part ⋈ orders ⋈ customer ⋈ nation ⋈ region +
    * supplier ⋈ nation), with the share ratio computed from ONE
    * aggregate via conditional sums (never two scans of the slice).
    *
    * Scale shape: region/nation and the type-filtered part are
    * metadata-scale → explicit broadcasts; supplier and the
    * region-filtered customer side are unhinted — proportional slices
    * of real dimension tables that AQE broadcasts when they fit and
    * shuffle-joins when they don't (a hardcoded hint would hard-fail
    * past 8 GB at 100 TB — the Layout.maybeBroadcast lesson). The share
    * is an exact integer-cents ratio rounded once at scale 6. */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val nation = read(s, dir, "nation")
    val asiaNations = nation
      .join(broadcast(read(s, dir, "region")
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("mkt_nk"))
    val cust = read(s, dir, "customer")
      .join(broadcast(asiaNations), col("c_nationkey") === col("mkt_nk"))
      .select(col("c_custkey"))
    val ord = read(s, dir, "orders")
      .filter(col("o_orderdate") >= expr("timestamp'1995-01-01 00:00:00'") &&
        col("o_orderdate") < expr("timestamp'1997-01-01 00:00:00'"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("bigint").as("o_year"))
    val prt = read(s, dir, "part")
      .filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val sup = read(s, dir, "supplier")
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    read(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .as("vol_i"))
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_5", col("vol_i"))
          .otherwise(0L)).as("nation_vol_i"),
        sum(col("vol_i")).as("total_vol_i"))
      .select(col("o_year"),
        Num.ratio(col("nation_vol_i"), col("total_vol_i"), 6)
          .as("mkt_share"),
        Num.r(col("total_vol_i").cast("double") / 10000, 2)
          .as("total_volume"))
  }
}
