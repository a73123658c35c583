package graft.tpch

import graft.util.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operator-coverage queries over the TPC-H-ish harness tables. Each maps to
  * SURVEY.md §2 operator classes on data the reference pipeline doesn't
  * reach (joins over dimension tables, sort+limit, semi/anti joins).
  *
  * Money columns (2-decimal doubles) are quantized to integer cents before
  * any aggregation so sums are exact and order-independent; see
  * graft.util.Num for the cross-engine rounding rule.
  */
object CoreOps {

  private def read(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  private def cents(c: String): org.apache.spark.sql.Column =
    expr(s"cast(round($c * 100, 0) as bigint)")

  /** TPC-H Q1 shape (A5/A6/A8): pricing summary with exact cents math.
    * Single shuffle, partial aggregation map-side; filter pushed to scan. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "lineitem")
      .filter(col("l_shipdate") <= expr("timestamp'2000-09-02 00:00:00'"))
      .withColumn("qty_l", expr("cast(round(l_quantity, 0) as bigint)"))
      .withColumn("ep_c", cents("l_extendedprice"))
      .withColumn("disc_c", cents("l_discount"))
      .withColumn("tax_c", cents("l_tax"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qty_l")).as("sum_qty"),
        sum(col("ep_c")).as("base_c_sum"),
        sum(col("ep_c") * (lit(100L) - col("disc_c"))).as("disc_price_i"),
        sum(col("ep_c") * (lit(100L) - col("disc_c")) *
          (lit(100L) + col("tax_c"))).as("charge_i"),
        sum(col("disc_c")).as("disc_c_sum"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("count_order"),
        Num.r(col("base_c_sum").cast("double") / 100, 2).as("sum_base_price"),
        Num.r(col("disc_price_i").cast("double") / 10000, 2)
          .as("sum_disc_price"),
        Num.r(col("charge_i").cast("double") / 1000000, 2).as("sum_charge"),
        Num.ratio(col("sum_qty"), col("count_order"), 2).as("avg_qty"),
        Num.r(col("disc_c_sum").cast("double") / (col("count_order") * 100), 4)
          .as("avg_disc"))

  /** TPC-H Q3 shape: 3-way join (filter → join → agg → deterministic
    * top-10). The customer filter reduces the build side before the join;
    * AQE/broadcast applies to the small side. */
  def q3RevenueTopK(s: SparkSession, dir: String): DataFrame = {
    val cust = read(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = read(s, dir, "orders")
      .filter(col("o_orderdate") < expr("timestamp'1998-03-15 00:00:00'"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = read(s, dir, "lineitem")
      .filter(col("l_shipdate") > expr("timestamp'1998-03-15 00:00:00'"))
      .select(col("l_orderkey"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .as("rev_i"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("orderdate"))
      .agg(sum(col("rev_i")).as("rev_i_sum"))
      .withColumn("revenue", Num.r(col("rev_i_sum").cast("double") / 10000, 2))
      .orderBy(col("rev_i_sum").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("orderdate"), col("revenue"))
  }

  /** Broadcast dimension join: customer ⋈ nation ⋈ region (both dims tiny
    * ⇒ broadcast-hash; no shuffle of the fact side beyond the agg). */
  def joinBroadcastDims(s: SparkSession, dir: String): DataFrame = {
    val cust = read(s, dir, "customer")
      .withColumn("bal_c", cents("c_acctbal"))
    val nation = read(s, dir, "nation")
    val region = read(s, dir, "region")
    cust
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("customers"),
        sum(col("bal_c")).as("bal_c_sum"))
      .withColumn("total_acctbal",
        Num.r(col("bal_c_sum").cast("double") / 100, 2))
      .withColumn("avg_acctbal",
        Num.r(col("bal_c_sum").cast("double") / (col("customers") * 100), 2))
      .drop("bal_c_sum")
  }

  /** Semi/anti joins: per nation, customers with vs without orders.
    * left_semi/left_anti avoid materializing the join payload. */
  def semiAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = read(s, dir, "customer")
    val orderKeys = read(s, dir, "orders").select(col("o_custkey"))
    val withOrders = cust.join(orderKeys,
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("customers_with_orders"))
    val withoutOrders = cust.join(orderKeys,
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("customers_without_orders"))
    cust.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("customers_total"))
      .join(withOrders, Seq("c_nationkey"), "left")
      .join(withoutOrders, Seq("c_nationkey"), "left")
      .na.fill(Map("customers_with_orders" -> 0L,
        "customers_without_orders" -> 0L))
  }

  /** W2 argmax on TPC-H: each customer's largest order (row_number over
    * (custkey) ordered by totalprice desc, orderkey tiebreak). */
  def topOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val ord = read(s, dir, "orders")
      .withColumn("price_c", cents("o_totalprice"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("price_c").desc, col("o_orderkey"))
    ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("top_orderkey"),
        Num.r(col("price_c").cast("double") / 100, 2).as("top_totalprice"))
  }

  /** TPC-H Q5 shape: six-table join — region filter flows through nation
    * to both customer and supplier (the classic local-supplier condition
    * c_nationkey = s_nationkey), revenue per nation. Dimension chain
    * broadcasts; the lineitem-orders join is the only big shuffle. */
  def q5LocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val region = read(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = read(s, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = read(s, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val supp = read(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val ord = read(s, dir, "orders")
      .filter(col("o_orderdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
        col("o_orderdate") < expr("timestamp'1997-01-01 00:00:00'"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = read(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .as("rev_i"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev_i")).as("rev_i_sum"),
        count(lit(1)).as("n_lineitems"))
      .withColumn("revenue", Num.r(col("rev_i_sum").cast("double") / 10000, 2))
      .drop("rev_i_sum")
  }

  /** TPC-H Q18 shape: HAVING over an aggregate — orders whose total
    * quantity exceeds the threshold, joined back to their customers. */
  def q18LargeOrders(s: SparkSession, dir: String,
                     minQty: Long = 250): DataFrame = {
    val bigOrders = read(s, dir, "lineitem")
      .withColumn("qty_l", expr("cast(round(l_quantity, 0) as bigint)"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("qty_l")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    read(s, dir, "orders")
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(read(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("orderdate"), col("total_qty"),
        Num.r(cents("o_totalprice").cast("double") / 100, 2)
          .as("totalprice"))
  }

  /** Running-total window frame: cumulative customer spend in order-date
    * order (rowsBetween unbounded preceding, total tie-break). */
  def runningCustomerSpend(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    read(s, dir, "orders")
      .withColumn("price_c", cents("o_totalprice"))
      .withColumn("running_c", sum(col("price_c")).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("orderdate"),
        Num.r(col("running_c").cast("double") / 100, 2).as("running_spend"))
  }

  /** Hierarchical rollup (grouping sets): leaf, per-flag subtotal, and
    * grand-total rows in one pass (Expand under Catalyst). */
  def rollupPricing(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "lineitem")
      .withColumn("qty_l", expr("cast(round(l_quantity, 0) as bigint)"))
      .withColumn("rev_i",
        cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("qty_l")).as("sum_qty"),
        sum(col("rev_i")).as("rev_i_sum"))
      .withColumn("revenue",
        Num.r(col("rev_i_sum").cast("double") / 10000, 2))
      .drop("rev_i_sum")

  /** Exact percentiles (median / p90) of order value per priority —
    * beyond-reference extension (SURVEY §2.4 notes the reference has no
    * percentile operator). Spark's exact `percentile` and DuckDB's
    * `quantile_cont` share the linear-interpolation definition and produce
    * bit-identical doubles on integer cents input. */
  def percentileSpend(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "orders")
      .withColumn("price_c", cents("o_totalprice"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("orders"),
        expr("percentile(price_c, 0.5)").as("median_price_c"),
        expr("percentile(price_c, 0.9)").as("p90_price_c"))
      .withColumn("median_price",
        Num.r(col("median_price_c") / 100, 2))
      .withColumn("p90_price", Num.r(col("p90_price_c") / 100, 2))
      .drop("median_price_c", "p90_price_c")

  /** Full cube (all four grouping sets over two dims) — complements
    * [[rollupPricing]]'s hierarchy with the column-marginal rows. Same
    * single-pass Expand plan under Catalyst. */
  def cubePricing(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "lineitem")
      .withColumn("qty_l", expr("cast(round(l_quantity, 0) as bigint)"))
      .withColumn("rev_i",
        cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("qty_l")).as("sum_qty"),
        sum(col("rev_i")).as("rev_i_sum"))
      .withColumn("revenue",
        Num.r(col("rev_i_sum").cast("double") / 10000, 2))
      .drop("rev_i_sum")

  /** Pivot: per order month, one count column per order status. The pivot
    * value list is explicit (O/F/P), so the schema is static and the plan
    * is a single hash aggregate — never pivot on an unbounded column at
    * scale. */
  def pivotOrderStatus(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "orders")
      .withColumn("order_month",
        to_date(date_trunc("month", col("o_orderdate"))))
      .groupBy(col("order_month"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("O", "F", "P"))
      .select(col("order_month"), col("O").as("open_orders"),
        col("F").as("finished_orders"), col("P").as("partial_orders"))

  /** Banded (non-equi) self-join: for every order, how many other orders
    * the same customer placed within ±7 days. The equi key (custkey)
    * bounds the join — the band predicate only filters within a
    * customer's own orders, so there is no range explosion at scale. */
  def bandJoinOrders(s: SparkSession, dir: String): DataFrame = {
    val o = read(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("orderdate"))
    o.as("a").join(o.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("a.o_orderkey") =!= col("b.o_orderkey") &&
          abs(datediff(col("a.orderdate"), col("b.orderdate"))) <= 7,
        "left")
      .groupBy(col("a.o_custkey").as("o_custkey"),
        col("a.o_orderkey").as("o_orderkey"),
        col("a.orderdate").as("orderdate"))
      .agg(count(col("b.o_orderkey")).as("nearby_orders"))
  }

  /** TPC-H Q19 shape: DISJUNCTIVE-predicate join — three OR'd
    * conjunctive branches, each constraining BOTH join sides (brand +
    * size bounds on part, a quantity range on lineitem), over one equi
    * key. The optimizer surface the conjunctive battery never touches:
    * Catalyst must keep `l_partkey = p_partkey` as the hash-join key
    * with the OR as a join residual, AND derive each side's one-sided
    * implication of the OR (the brand∧size union onto the part scan,
    * the quantity-range union onto the lineitem scan) so BOTH scans
    * prune before the join — a planner that ships the whole OR to a
    * post-join filter reads and shuffles every lineitem row at 100 TB.
    * PlanSpec pins the pushed Or filters on both scans and the equi
    * hash join. Revenue in integer hundredths-of-cents until the one
    * output rounding (the [[graft.util.Num]] rule). */
  def q19DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val prt = read(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val li = read(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .as("rev_i"))
    def branch(b: String, s0: Int, s1: Int, q0: Int, q1: Int) =
      col("p_brand") === b && col("p_size").between(s0, s1) &&
        col("l_quantity").between(q0, q1)
    li.join(prt, col("l_partkey") === col("p_partkey") &&
        (branch("Brand#1", 1, 15, 1, 20) ||
          branch("Brand#3", 10, 30, 15, 35) ||
          branch("Brand#5", 20, 50, 30, 50)))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), sum(col("rev_i")).as("rev_i"))
      .select(col("p_brand").as("brand"), col("n_items"),
        Num.r(col("rev_i").cast("double") / 10000, 2).as("revenue"))
  }

  /** Set operators (SURVEY §2.7 notes the reference has none): customers
    * who ordered in BOTH 1995 and 1996 (INTERSECT) but NOT in 1997
    * (EXCEPT). Catalyst rewrites both to semi/anti joins over the
    * pre-aggregated (distinct) keys, so no full-row comparison runs. */
  def setOpsCustomers(s: SparkSession, dir: String): DataFrame = {
    def inYear(y: Int) = read(s, dir, "orders")
      .filter(col("o_orderdate") >=
        expr(s"timestamp'$y-01-01 00:00:00'") &&
        col("o_orderdate") < expr(s"timestamp'${y + 1}-01-01 00:00:00'"))
      .select(col("o_custkey"))
    inYear(1995).intersect(inYear(1996)).except(inYear(1997))
      .orderBy(col("o_custkey"))
  }

  /** Two-phase salted aggregation over a pathologically skewed key
    * (l_returnflag: 3 values across the whole fact table, so a plain
    * groupBy funnels everything through 3 reducers). The salt spreads the
    * hot keys over 16 partial reducers; the oracle is the PLAIN GROUP BY
    * — the whole point is that salting changes the plan, not the
    * answer. */
  def saltedSkewAgg(s: SparkSession, dir: String): DataFrame =
    graft.util.Skew.saltedSumCount(
      read(s, dir, "lineitem")
        .withColumn("qty_l", expr("cast(round(l_quantity, 0) as bigint)"))
        .select("l_returnflag", "qty_l"),
      Seq("l_returnflag"), "qty_l")

  /** Deliberately skewed JOIN under the measured salt arm
    * ([[graft.util.Skew.measuredJoin]] — the companion to
    * [[saltedSkewAgg]]'s aggregation skew): every even l_partkey
    * collapses onto ONE derived join key (−1), so ~half the fact table
    * shares a single key — the hot-key shape the reference explicitly
    * configures AQE skewJoin for (gold_daily_dag.py:29-31), here made
    * adversarial (one key ≫ any AQE partition threshold at scale). The
    * per-key measurement finds the hot key, the fact's hot rows
    * scatter over a derived salt count, the dim's one hot row
    * replicates across the salts, and the join runs on (key, salt) —
    * no single task carries the hot key. The oracle is the PLAIN join
    * + aggregate: salting changes the plan, never the answer. */
  def skewJoinHotKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fact = read(s, dir, "lineitem").select(
      when(col("l_partkey") % 2 === 0, lit(-1L))
        .otherwise(col("l_partkey")).as("jk"),
      expr("cast(round(l_extendedprice * 100, 0) as bigint)").as("cents"))
    val dim = read(s, dir, "part")
      .select(col("p_partkey").as("jk"), col("p_brand"))
      .unionByName(Seq((-1L, "HOT#00")).toDF("jk", "p_brand"))
    graft.util.Skew.measuredJoin(fact, dim, "jk")
      .groupBy(col("p_brand"))
      .agg(sum(col("cents")).as("revenue_cents"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  /** Ranking-function battery over per-customer order spend: `rank` /
    * `dense_rank` / `percent_rank` ordered by spend alone (tie groups share
    * a rank, so the output is deterministic under ties), plus `ntile(10)`
    * deciles over a TOTAL order (spend, custkey) — ntile assigns by row
    * position, so it is only deterministic with a unique sort key.
    *
    * NO global (partition-less) window anywhere: a global rank would
    * funnel |customers| rows — billions at 100 TB — through one task.
    * Instead ONE range partitioning feeds every column:
    *
    *  1. the per-customer spend frame is range-partitioned by spend_c
    *     ALONE — RangePartitioner sends equal keys to one partition, so
    *     a tie group never spans partitions and local `rank` /
    *     `dense_rank` / `row_number` windows are globally stitchable;
    *  2. one driver-collected pid-stats pass (P rows — metadata-scale,
    *     like IvfCosine's nlist centroids) yields per-partition row and
    *     tie-group offsets: `rank = rows_off + local_rank`,
    *     `dense_rank = groups_off + local_dense_rank`;
    *  3. `percent_rank = (rank−1)/(n−1)` with the total n a driver
    *     scalar folded into the plan — one IEEE division on exact
    *     integers, identical in both engines;
    *  4. `ntile` from the stitched global row_number over the
    *     (spend_c, o_custkey) total order (same partitioning — the
    *     local window just orders by the full key) via the SQL-standard
    *     bucket formula (first n mod k buckets get one extra row).
    *
    * Values are invariant to where the sampled range boundaries fall, so
    * RangePartitioner's sampling does not affect determinism. One
    * persist, one collect, no join-back — the round-3 two-frame
    * composition (groups + rows, two offset jobs) fused. */
  def rankSpendDeciles(s: SparkSession, dir: String): DataFrame = {
    val parts = s.sessionState.conf.numShufflePartitions
    // Persisted: the frame feeds the stats job and the composition, and
    // persisting freezes the sampled range boundaries so pid assignment
    // is identical between them. Released by the harness' clearCache.
    val spend = read(s, dir, "orders")
      .withColumn("price_c", cents("o_totalprice"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("price_c")).as("spend_c"), count(lit(1)).as("orders"))
      .repartitionByRange(parts, col("spend_c"))
      .withColumn("pid", spark_partition_id())
      .persist()

    val pidStats = spend.groupBy(col("pid"))
      .agg(count(lit(1)).as("rows_in"),
        countDistinct(col("spend_c")).as("groups_in"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val n = pidStats.map(_._2).sum
    val offsets = {
      var rows = 0L; var grps = 0L
      pidStats.map { case (pid, ri, gi) =>
        val o = (pid, rows, grps); rows += ri; grps += gi; o
      }
    }
    val offsetsDf = s.createDataFrame(
      s.sparkContext.parallelize(offsets.toIndexedSeq, 1)
        .map(o => org.apache.spark.sql.Row(o._1, o._2, o._3)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("rows_off",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("groups_off",
          org.apache.spark.sql.types.LongType))))

    val wSpend = Window.partitionBy(col("pid")).orderBy(col("spend_c"))
    val wTotal = Window.partitionBy(col("pid"))
      .orderBy(col("spend_c"), col("o_custkey"))
    // SQL-standard ntile(k): q = n div k rows per bucket, the first
    // n mod k buckets take one extra.
    val k = 10L
    val q = n / k; val rem = n % k
    val qSafe = if (q == 0) 1L else q
    spend
      .withColumn("rank_local", rank().over(wSpend).cast("long"))
      .withColumn("dense_local", dense_rank().over(wSpend).cast("long"))
      .withColumn("rn_local", row_number().over(wTotal).cast("long"))
      .join(broadcast(offsetsDf), Seq("pid"))
      .withColumn("spend_rank",
        (col("rows_off") + col("rank_local")).cast("int"))
      .withColumn("spend_dense_rank",
        (col("groups_off") + col("dense_local")).cast("int"))
      .withColumn("rn", col("rows_off") + col("rn_local"))
      .withColumn("decile",
        when(lit(rem) > 0 && col("rn") <= lit(rem * (q + 1)),
          expr(s"cast((rn + $q) div ${q + 1} as int)"))
          .otherwise(
            expr(s"cast($rem + (rn - ${rem * (q + 1)} + ${qSafe - 1}) " +
              s"div $qSafe as int)")))
      .withColumn("spend_percent_rank",
        if (n <= 1L) lit(0.0)
        else (col("spend_rank").cast("double") - 1.0) / (n - 1).toDouble)
      .select(col("o_custkey"), col("spend_c"), col("orders"),
        col("spend_rank"), col("spend_dense_rank"),
        col("spend_percent_rank"), col("decile"))
  }

  /** Year-over-year customer churn via FULL OUTER join (the one outer-join
    * shape the reference never uses; its J5/J6 retention joins are left
    * joins + null checks). Distinct 1995/1996 customer sets full-outer
    * joined on custkey classify every customer as retained / churned /
    * new; the final count-by-status is exactly the churn report a
    * warehouse emits. Both inputs are distinct projections (small), so AQE
    * picks shuffle-hash or broadcast as sizes allow; the classification is
    * null-pattern inspection, no second pass. */
  def fullOuterChurn(s: SparkSession, dir: String): DataFrame = {
    def inYear(y: Int) = read(s, dir, "orders")
      .filter(col("o_orderdate") >=
        expr(s"timestamp'$y-01-01 00:00:00'") &&
        col("o_orderdate") < expr(s"timestamp'${y + 1}-01-01 00:00:00'"))
      .select(col("o_custkey")).distinct()
    inYear(1995).as("a")
      .join(inYear(1996).as("b"),
        col("a.o_custkey") === col("b.o_custkey"), "full_outer")
      .withColumn("status",
        when(col("a.o_custkey").isNotNull && col("b.o_custkey").isNotNull,
          "retained")
          .when(col("a.o_custkey").isNotNull, "churned")
          .otherwise("new"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("customers"))
  }

  /** Explicit GROUPING SETS — the general form behind [[rollupPricing]] /
    * [[cubePricing]]: three chosen sets (flag+status, flag, status) with
    * `grouping()` markers so rows are unambiguous when a dim is NULL.
    * Catalyst lowers all grouping-set variants to one Expand + hash
    * aggregate — a single pass over the fact table at any scale. */
  def groupingSetsPricing(s: SparkSession, dir: String): DataFrame = {
    read(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  cast(grouping(l_returnflag) as int) AS g_flag,
        |  cast(grouping(l_linestatus) as int) AS g_status,
        |  count(1) AS n_items,
        |  sum(cast(round(l_quantity, 0) as bigint)) AS sum_qty
        |FROM graft_lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus))""".stripMargin)
  }

  /** A2/A3/A4 distinct-aggregate battery per order day. */
  def ordersDailyDistinct(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("orderdate"))
      .agg(
        count(lit(1)).as("orders"),
        countDistinct(col("o_custkey")).as("customers"),
        countDistinct(struct(col("o_custkey"), col("o_orderstatus")))
          .as("cust_status_pairs"),
        countDistinct(when(col("o_orderpriority") === "1-URGENT",
          col("o_custkey"))).as("urgent_customers"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0))
          .cast("bigint").as("finished_orders"))
      .withColumn("urgent_customer_ratio",
        Num.guardedRatio(col("urgent_customers"), col("customers"), 4))

  /** RFM customer segmentation — the feature-store staple: per customer
    * Recency (days since last order, against the corpus's max order
    * date), Frequency (order count), Monetary (exact cents), and a
    * fixed-threshold segment label (thresholds sit at the measured
    * corpus quartiles: recency 90/180/365 days, frequency 10/12 —
    * FIXED constants, not per-run quantiles, so scoring is stable
    * release-to-release the way a production segment definition is).
    *
    * Plan shape: one customer aggregate (map-side combined), the
    * 1-row reference date broadcast back (the tfIdfRetrieve scalar
    * pattern), then pure projection. Integer days/counts/cents
    * end-to-end. */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val o = read(s, dir, "orders")
    val ref = o.agg(max(col("o_orderdate")).as("ref_date"))
    o.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("f_orders"),
        sum(cents("o_totalprice")).as("m_cents"))
      .crossJoin(broadcast(ref))
      .withColumn("r_days",
        datediff(col("ref_date"), col("last_order")).cast("long"))
      .withColumn("segment",
        when(col("r_days") <= 90 && col("f_orders") >= 12, "champion")
          .when(col("r_days") <= 180 && col("f_orders") >= 10, "loyal")
          .when(col("r_days") <= 180, "active")
          .when(col("r_days") <= 365, "lapsing")
          .otherwise("dormant"))
      .select("o_custkey", "r_days", "f_orders", "m_cents", "segment")
  }

  /** TPC-H Q6 shape: the forecasting-revenue-change aggregate — the one
    * query in the spec that is PURE scan→aggregate, whose entire cost
    * is decided by how much of the three-conjunct range predicate
    * (ship-year window, discount band, quantity ceiling) reaches the
    * parquet scan. All three are plain column-vs-literal comparisons,
    * so all three push into `PushedFilters` and prune row groups via
    * min/max statistics BEFORE decode — at 100 TB this query reads the
    * year's row groups of three columns and nothing else, no shuffle
    * beyond the single-row partial-aggregate collect. The discount
    * band deliberately compares the stored double against double
    * literals (both engines parse `0.05` to the identical IEEE value),
    * keeping the predicate pushable where a cents-quantized rewrite
    * (`round(l_discount*100)`) would wrap the column in an expression
    * and forfeit the scan-level prune. Revenue is
    * `sum(extendedprice·discount)` in exact integer
    * hundredths-of-cents. */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "lineitem")
      .filter(col("l_shipdate") >= expr("timestamp'1997-01-01 00:00:00'") &&
        col("l_shipdate") < expr("timestamp'1998-01-01 00:00:00'") &&
        col("l_discount") >= lit(0.05) && col("l_discount") <= lit(0.07) &&
        col("l_quantity") < lit(24.0))
      .agg(
        sum(cents("l_extendedprice") * cents("l_discount")).as("rev_i"),
        count(lit(1)).as("n_items"))
      .select(
        Num.r(col("rev_i").cast("double") / 10000, 2).as("revenue"),
        col("n_items"))
}
