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

  /** TPC-H Q7 shape: bilateral shipping volume between two nations by
    * ship year — the join whose defining predicate is a DISJUNCTION
    * OVER A PAIR of dimension attributes (`(supp=A ∧ cust=B) ∨
    * (supp=B ∧ cust=A)`), which no single join condition can carry.
    * The scale move: each nation join is pre-filtered to the two-nation
    * SUPERSET `{A,B}` (a pushable conjunct that prunes both dimension
    * scans and shrinks the fact join to the bilateral slice), and only
    * the cheap pair disjunction remains as a residual filter on the
    * joined rows — without the superset push the disjunction would
    * force both joins to carry all 25 nations. Both nation sides are
    * 2-row broadcasts; revenue is exact integer
    * hundredths-of-cents. */
  def q7NationVolume(s: SparkSession, dir: String): DataFrame = {
    val nations = read(s, dir, "nation")
      .filter(col("n_name").isin("NATION_3", "NATION_7"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = read(s, dir, "supplier")
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = read(s, dir, "customer")
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = read(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    read(s, dir, "lineitem")
      .filter(col("l_shipdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
        col("l_shipdate") < expr("timestamp'1998-01-01 00:00:00'"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("bigint").as("l_year"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .as("rev_i"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("rev_i")).as("rev_i_sum"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        Num.r(col("rev_i_sum").cast("double") / 10000, 2).as("revenue"))
  }

  /** TPC-H Q9 shape: profit by supplier nation and year for one part
    * family — a SIGNED aggregate (revenue MINUS cost, so partial sums
    * must commute across negative terms) over a LIKE-filtered part
    * dimension. The harness has no partsupp supplycost, so cost is the
    * part's retail price × quantity — same join topology, same signed
    * arithmetic. The `%widget%` LIKE cannot prune a sorted index, but
    * it IS pushed to the part scan (a string-contains filter on a
    * metadata-scale dimension), and the surviving partkeys broadcast
    * into the fact join. Profit stays integer hundredths-of-cents
    * end-to-end: `ep_c·(100−disc_c) − retail_c·qty·100`. */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val prt = read(s, dir, "part")
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), cents("p_retailprice").as("retail_c"))
    val sup = read(s, dir, "supplier")
      .join(broadcast(read(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    read(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("bigint").as("o_year"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .as("rev_i"),
        (expr("cast(round(l_quantity, 0) as bigint)") * lit(100L))
          .as("qty_h"))
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum(col("rev_i") - col("retail_c") * col("qty_h"))
        .as("profit_i"))
      .select(col("nation"), col("o_year"),
        Num.r(col("profit_i").cast("double") / 10000, 2).as("profit"))
  }

  /** TPC-H Q10 shape: the quarter's top-20 customers by RETURNED
    * revenue — a returnflag-sliced fact join ranked by an exact integer
    * sum with a key tiebreak, so the LIMIT frontier is deterministic
    * cross-engine (a float revenue would make rank 20 vs 21
    * engine-dependent). Both date and returnflag predicates push to
    * their scans BEFORE the join; the top-k is a TakeOrderedAndProject
    * (per-partition heads + one driver merge), never a full sort. */
  def q10ReturnedRevenue(s: SparkSession, dir: String): DataFrame = {
    val ord = read(s, dir, "orders")
      .filter(col("o_orderdate") >= expr("timestamp'1997-01-01 00:00:00'") &&
        col("o_orderdate") < expr("timestamp'1997-04-01 00:00:00'"))
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = read(s, dir, "customer")
      .join(broadcast(read(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
    read(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .as("rev_i"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(sum(col("rev_i")).as("rev_i_sum"))
      .orderBy(col("rev_i_sum").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"),
        Num.r(col("rev_i_sum").cast("double") / 10000, 2).as("revenue"),
        col("c_acctbal"), col("n_name"))
  }

  /** TPC-H Q14 shape: promo revenue share of one month — the
    * ratio-of-conditional-sums computed from ONE aggregate over ONE
    * pass (the naive form scans the slice twice, once per sum). The
    * month predicate prunes the fact scan; the part side carries only
    * the boolean the CASE needs, not the whole dimension row. The
    * share is an exact integer-cents ratio rounded once at scale 6 —
    * both engines divide the same two bigints. */
  def q14PromoShare(s: SparkSession, dir: String): DataFrame = {
    val prt = read(s, dir, "part")
      .select(col("p_partkey"),
        (col("p_type") === "PROMO").as("is_promo"))
    read(s, dir, "lineitem")
      .filter(col("l_shipdate") >= expr("timestamp'1997-09-01 00:00:00'") &&
        col("l_shipdate") < expr("timestamp'1997-10-01 00:00:00'"))
      .select(col("l_partkey"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .as("rev_i"))
      .join(prt, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("is_promo"), col("rev_i")).otherwise(0L))
          .as("promo_i"),
        sum(col("rev_i")).as("total_i"))
      .select(
        Num.ratio(col("promo_i") * lit(100L), col("total_i"), 4)
          .as("promo_share_pct"),
        Num.r(col("total_i").cast("double") / 10000, 2)
          .as("total_revenue"))
  }

  /** TPC-H Q12 shape: shipping-delay audit — did lower-priority orders
    * ship late more often? The defining feature is the CROSS-TABLE
    * date-lag predicate (`l_shipdate ≥ o_orderdate + 60 days`): it
    * references both relations, so unlike every other filter in the
    * battery it CANNOT push to either scan — it stays a residual
    * evaluated on joined rows (the harness schema carries no
    * commit/receipt dates, so the spec's receipt-vs-commit lag becomes
    * the ship-vs-order lag; same shape, same plan consequence). What
    * DOES push: the ship-year window prunes the lineitem scan before
    * the join, and both scans prune to the 3 columns the query needs.
    * The aggregate is the spec's two-way conditional count — ONE pass,
    * two `sum(CASE …)` branches over the same priority test, never two
    * joins or a pivot. At 100 TB: one equi-shuffle on orderkey (or an
    * AQE broadcast of the pruned year slice), map-side-combined counts
    * over a ≤3-row group domain. */
  def q12LatePriority(s: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val li = read(s, dir, "lineitem")
      .filter(col("l_shipdate") >= expr("timestamp'1997-01-01 00:00:00'") &&
        col("l_shipdate") < expr("timestamp'1998-01-01 00:00:00'"))
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
    val ord = read(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >=
        col("o_orderdate") + expr("interval 60 days"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
  }
}
