package graft.tpch

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Correlated-subquery surface (TPC-H Q4/Q17/Q21 class) — the analytics
  * shapes a SQL user reaches for immediately that the plain join battery
  * never exercises: `EXISTS`, `NOT EXISTS`, and correlated scalar
  * subqueries against orders/lineitem.
  *
  * Deliberately written as SQL TEXT over temp views, not DataFrame
  * joins: the point is Catalyst's decorrelation pipeline
  * (`RewritePredicateSubquery` rewrites EXISTS/NOT EXISTS into
  * left-semi / left-anti hash joins; `RewriteCorrelatedScalarSubquery`
  * turns the correlated scalar into an aggregate-then-join) — the
  * engine must plan these as distributed equi-joins, never a per-row
  * re-execution. PlanSpec pins the rewrite: the optimized plans show
  * LeftSemi/LeftAnti joins and no nested-loop/cartesian operator, so at
  * 100 TB each subquery costs one shuffled (or broadcast) hash join on
  * the correlation key.
  *
  * The harness lineitem carries no commit/receipt dates, so the TPC-H
  * "late" predicate is re-expressed on the available columns as
  * `l_shipdate > o_orderdate + 60 days`; counts and integer-cents sums
  * keep every aggregate exact cross-engine (the [[CoreOps]] money
  * rule). */
object SubqueryOps {

  private def view(s: SparkSession, dir: String, t: String): Unit =
    s.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(s"sq_$t")

  /** TPC-H Q4 shape: order-priority census of orders with at least one
    * late lineitem — a correlated EXISTS whose decorrelation is a
    * left-semi join of orders against lineitem on the order key (the
    * date predicate rides the join condition; no pre-aggregation, no
    * distinct blow-up). One year of orders, counted by priority. */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "orders"); view(s, dir, "lineitem")
    s.sql(
      """SELECT o_orderpriority, count(1) AS order_count
        |FROM sq_orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (
        |    SELECT 1 FROM sq_lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    * finalized multi-supplier order — the full EXISTS + NOT EXISTS
    * pair over the same fact table. Catalyst plans the EXISTS as a
    * left-semi and the NOT EXISTS as a left-anti join, both equi on
    * `l_orderkey` with the inequality predicates as join residuals;
    * the NOT EXISTS correlates on TWO outer tables (l1's orderkey and
    * o's orderdate), the decorrelation case naive rewrites get wrong.
    * Counts only ⇒ exact cross-engine. */
  def q21SuppliersWaiting(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "supplier"); view(s, dir, "lineitem")
    view(s, dir, "orders")
    s.sql(
      """SELECT s.s_name, count(1) AS numwait
        |FROM sq_supplier s
        |JOIN sq_lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN sq_orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM sq_lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM sq_lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s.s_name""".stripMargin)
  }

  /** TPC-H Q17 shape: revenue from small-quantity orders of each brand —
    * per-part "below 20% of this part's average quantity", phrased as
    * TWO correlated scalar subqueries (per-part count and quantity sum)
    * so the 0.2·avg comparison becomes an exact integer
    * cross-multiplication (qty·5·cnt < sum ⟺ qty < 0.2·sum/cnt): no
    * float division ever happens, so the boundary can't flip between
    * engines. `RewriteCorrelatedScalarSubquery` decorrelates each into
    * one partkey-grain aggregate joined back — at scale, two map-side-
    * combined aggregations plus equi-joins, not a per-row probe. */
  def q17SmallQuantityRevenue(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "lineitem"); view(s, dir, "part")
    s.sql(
      """SELECT p.p_brand, count(1) AS n_small,
        |  round((cast(sum(cast(round(l1.l_extendedprice * 100, 0)
        |    AS bigint)) AS double) / 100) * 100, 0) / 100.0 AS revenue
        |FROM sq_lineitem l1
        |JOIN sq_part p ON p.p_partkey = l1.l_partkey
        |WHERE cast(round(l1.l_quantity, 0) AS bigint) * 5 *
        |    (SELECT count(1) FROM sq_lineitem l2
        |     WHERE l2.l_partkey = l1.l_partkey)
        |  < (SELECT sum(cast(round(l3.l_quantity, 0) AS bigint))
        |     FROM sq_lineitem l3 WHERE l3.l_partkey = l1.l_partkey)
        |GROUP BY p.p_brand""".stripMargin)
  }

  /** TPC-H Q22 shape: well-funded customers gone idle — an UNCORRELATED
    * scalar aggregate subquery in the filter (the global
    * positive-balance mean) plus a correlated NOT EXISTS (no order in
    * the last observed window). The harness customer carries no phone,
    * so the country-code IN-list is re-expressed on `c_nationkey`; the
    * "balance above the average" comparison follows the Q17 rule —
    * two uncorrelated scalars (count and cents-sum) cross-multiplied so
    * no float division can flip the boundary between engines. Catalyst
    * plans the scalars as one-row broadcast joins (ScalarSubquery →
    * OneRowRelation aggregate) and the NOT EXISTS as a left-anti join
    * on `o_custkey` with the date predicate pushed into the anti side's
    * scan — at 100 TB: one tiny global aggregate plus one shuffled
    * anti join, never a per-row probe. */
  def q22IdleCustomers(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "customer"); view(s, dir, "orders")
    view(s, dir, "nation")
    s.sql(
      """SELECT n.n_name AS cntry, count(1) AS numcust,
        |  round((cast(sum(cast(round(c.c_acctbal * 100, 0) AS bigint))
        |    AS double) / 100) * 100, 0) / 100.0 AS totacctbal
        |FROM sq_customer c
        |JOIN sq_nation n ON n.n_nationkey = c.c_nationkey
        |WHERE c.c_nationkey IN (3, 7, 11, 14, 19)
        |  AND cast(round(c.c_acctbal * 100, 0) AS bigint) *
        |    (SELECT count(1) FROM sq_customer c2
        |     WHERE c2.c_acctbal > 0.0
        |       AND c2.c_nationkey IN (3, 7, 11, 14, 19))
        |  > (SELECT sum(cast(round(c3.c_acctbal * 100, 0) AS bigint))
        |     FROM sq_customer c3
        |     WHERE c3.c_acctbal > 0.0
        |       AND c3.c_nationkey IN (3, 7, 11, 14, 19))
        |  AND NOT EXISTS (
        |    SELECT 1 FROM sq_orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY n.n_name""".stripMargin)
  }

  /** TPC-H Q15 shape: the top-revenue supplier of a quarter — a scalar
    * MAX subquery over a DERIVED AGGREGATE (the revenue view referenced
    * twice: once as the join input, once inside the scalar). Revenue is
    * summed in integer hundredths-of-cents, so the `rev_i = max(rev_i)`
    * equality is exact and tie-complete cross-engine (floats would make
    * "the max" engine-dependent). Catalyst evaluates the scalar branch
    * as its own aggregate and broadcasts the one-row result into the
    * filter — two passes over one quarter's lineitem slice, both
    * map-side combined, no correlated re-execution. */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "lineitem"); view(s, dir, "supplier")
    s.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(cast(round(l_extendedprice * 100, 0) AS bigint) *
        |        (100 - cast(round(l_discount * 100, 0) AS bigint)))
        |      AS rev_i
        |  FROM sq_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name,
        |  round((cast(r.rev_i AS double) / 10000) * 100, 0) / 100.0
        |    AS total_revenue
        |FROM sq_supplier s
        |JOIN revenue r ON s.s_suppkey = r.supplier_no
        |WHERE r.rev_i = (SELECT max(rev_i) FROM revenue)""".stripMargin)
  }

  /** Null-aware `NOT IN (subquery)` — the one decorrelation surface NOT
    * EXISTS cannot stand in for: under SQL three-valued logic a single
    * NULL in the inner relation makes `x NOT IN (...)` UNKNOWN for
    * every x, emptying the result (q22's NOT EXISTS just skips the NULL
    * row). Catalyst cannot prove parquet columns non-null, so the
    * rewrite is a left-anti join on `x = y OR isnull(x = y)` — which
    * hash joins cannot key. Spark's `optimizeNullAwareAntiJoin` (on by
    * default) recovers the single-column case as a BROADCAST hash join
    * with `isNullAwareAntiJoin=true`: build the inner once, reject all
    * if it contains a NULL (PlanSpec pins this operator; a planted-NULL
    * spec pins the empty-result semantics).
    *
    * Scale rule, stated honestly: the null-aware anti join exists ONLY
    * in broadcast form — an inner too big to broadcast falls back to
    * BroadcastNestedLoopJoin, so at 100 TB a NOT IN over a fact-scale
    * nullable inner is a trap. Either prove the inner non-null
    * (`AND o_custkey IS NOT NULL` → plain shuffled left-anti, q21's
    * plan) or phrase it as NOT EXISTS (q22) when NULL-rejection
    * semantics are not wanted. Here the inner is one half-year of
    * order custkeys — the registered form documents the semantics
    * surface at a broadcastable inner size. Same business question as
    * q22 (idle customers), deliberately: the two queries differ ONLY
    * in the decorrelation path. */
  def q16IdleCustomersNotIn(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "customer"); view(s, dir, "orders")
    s.sql(
      """SELECT c.c_mktsegment AS segment, count(1) AS n_idle
        |FROM sq_customer c
        |WHERE c.c_custkey NOT IN (
        |  SELECT o.o_custkey FROM sq_orders o
        |  WHERE o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c.c_mktsegment""".stripMargin)
  }

  /** TPC-H Q2 shape: the cheapest regional supplier of each part — the
    * DEEPEST decorrelation in the battery: a correlated scalar MIN over
    * a MULTI-TABLE join (lineitem ⋈ supplier ⋈ nation ⋈ region), the
    * correlation (`l2.l_partkey = p.p_partkey`) buried under three
    * uncorrelated joins. The harness has no partsupp table, so lineitem
    * is the part↔supplier bridge and "supply cost" is the shipped
    * extended price. `RewriteCorrelatedScalarSubquery` must hoist the
    * whole join subtree into ONE partkey-grain aggregate joined back —
    * a per-row re-execution of a 4-table join is the classic optimizer
    * failure this query exists to catch (PlanSpec pins
    * aggregate-then-join). Price stays integer CENTS end-to-end, so the
    * min-equality is exact and tie-complete cross-engine; DISTINCT
    * collapses a supplier shipping the same part at the min price
    * twice. */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "lineitem"); view(s, dir, "part")
    view(s, dir, "supplier"); view(s, dir, "nation")
    view(s, dir, "region")
    s.sql(
      """SELECT DISTINCT s.s_name, p.p_partkey, p.p_type,
        |  cast(round(l.l_extendedprice * 100, 0) AS bigint)
        |    AS min_price_cents
        |FROM sq_lineitem l
        |JOIN sq_part p ON p.p_partkey = l.l_partkey
        |JOIN sq_supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN sq_nation n ON n.n_nationkey = s.s_nationkey
        |JOIN sq_region r ON r.r_regionkey = n.n_regionkey
        |WHERE r.r_name = 'ASIA' AND p.p_size = 5
        |  AND cast(round(l.l_extendedprice * 100, 0) AS bigint) = (
        |    SELECT min(cast(round(l2.l_extendedprice * 100, 0) AS bigint))
        |    FROM sq_lineitem l2
        |    JOIN sq_supplier s2 ON s2.s_suppkey = l2.l_suppkey
        |    JOIN sq_nation n2 ON n2.n_nationkey = s2.s_nationkey
        |    JOIN sq_region r2 ON r2.r_regionkey = n2.n_regionkey
        |    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'ASIA')""".stripMargin)
  }

  /** TPC-H Q11 shape: the parts that individually carry more than
    * 1/500 of a nation's total shipped value — an uncorrelated scalar
    * aggregate subquery referenced from HAVING, i.e. a filter on
    * AGGREGATED output, not on input rows. Catalyst evaluates the
    * scalar branch ONCE (its own aggregate over the same filtered
    * join) and feeds the one-row result into the post-aggregation
    * filter — two passes over the nation's slice, both map-side
    * combined, never a per-group re-execution (PlanSpec pins the
    * one-shot scalar). The threshold comparison is
    * `part_value_cents · 500 > total_value_cents`: pure bigint
    * cross-multiplication, no float fraction to flip the boundary
    * cross-engine. */
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "lineitem"); view(s, dir, "supplier")
    s.sql(
      """SELECT l.l_partkey,
        |  sum(cast(round(l.l_extendedprice * 100, 0) as bigint))
        |    AS value_cents
        |FROM sq_lineitem l
        |JOIN sq_supplier s ON s.s_suppkey = l.l_suppkey
        |WHERE s.s_nationkey = 3
        |GROUP BY l.l_partkey
        |HAVING sum(cast(round(l.l_extendedprice * 100, 0) as bigint))
        |    * 500 > (
        |  SELECT sum(cast(round(l2.l_extendedprice * 100, 0) as bigint))
        |  FROM sq_lineitem l2
        |  JOIN sq_supplier s2 ON s2.s_suppkey = l2.l_suppkey
        |  WHERE s2.s_nationkey = 3)""".stripMargin)
  }

  /** TPC-H Q20 shape: suppliers who shipped the DOMINANT share of some
    * part — the deepest NESTING in the battery: an IN subquery whose
    * inner is itself a GROUP BY with (a) another IN subquery filtering
    * its input and (b) a CORRELATED scalar aggregate in its HAVING
    * (the correlation on the inner query's own grouping column,
    * `l2.l_partkey = l1.l_partkey`). Catalyst must decorrelate
    * inside-out: the HAVING scalar becomes a partkey-grain aggregate
    * joined to the grouped inner, the part IN becomes a semi join, and
    * the outer IN a semi join on suppkey — four joins and two
    * aggregates, zero per-row re-execution (PlanSpec pins no
    * nested-loop operator). "More than a third of the part's year
    * volume" is bigint cross-multiplication (`sum·3 > total`), exact
    * cross-engine. */
  def q20DominantShippers(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "supplier"); view(s, dir, "lineitem")
    view(s, dir, "part")
    s.sql(
      """SELECT s.s_name, s.s_suppkey
        |FROM sq_supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT l1.l_suppkey FROM sq_lineitem l1
        |  WHERE l1.l_partkey IN (
        |      SELECT p.p_partkey FROM sq_part p
        |      WHERE p.p_name LIKE 'small%')
        |    AND l1.l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l1.l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l1.l_suppkey, l1.l_partkey
        |  HAVING sum(cast(round(l1.l_quantity, 0) as bigint)) * 3 > (
        |    SELECT sum(cast(round(l2.l_quantity, 0) as bigint))
        |    FROM sq_lineitem l2
        |    WHERE l2.l_partkey = l1.l_partkey
        |      AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
        |      AND l2.l_shipdate < TIMESTAMP '1998-01-01'))""".stripMargin)
  }

  /** The COUNT-bug surface: a correlated scalar `COUNT(*)` in the
    * SELECT list. Naive decorrelation (outer join + aggregate) yields
    * NULL for outer rows with no match, but SQL semantics demand the
    * subquery's own result over an empty input — COUNT's is 0, not
    * NULL. This is the classic correctness trap of scalar-subquery
    * rewrites (every decorrelation paper's first counterexample);
    * Catalyst patches the join's null with the aggregate's
    * empty-input value. The query slices customers to one segment and
    * counts each one's URGENT orders — most customers have ZERO, so
    * the bug (NULL/dropped rows instead of 0) cannot hide in the
    * output; the oracle runs the literal correlated form in DuckDB.
    * Plan: one aggregate at the custkey grain left-outer-joined back —
    * never a per-customer re-execution (PlanSpec pins it). */
  def scalarCountBug(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "customer"); view(s, dir, "orders")
    s.sql(
      """SELECT c.c_custkey,
        |  (SELECT count(1) FROM sq_orders o
        |   WHERE o.o_custkey = c.c_custkey
        |     AND o.o_orderpriority = '1-URGENT'
        |     AND o.o_orderdate >= TIMESTAMP '1997-06-01'
        |     AND o.o_orderdate < TIMESTAMP '1997-09-01')
        |    AS n_urgent_q3
        |FROM sq_customer c
        |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin)
  }

  /** LATERAL correlated top-k: each customer's 3 largest orders — the
    * per-entity-top-k every feature pipeline writes, in its SQL-native
    * LATERAL form (a subquery with a correlated predicate AND its own
    * ORDER BY + LIMIT, re-executed per outer row under naive
    * semantics). This is the decorrelation surface the
    * EXISTS/IN/scalar battery doesn't reach: `DecorrelateInnerQuery`
    * must turn the per-row LIMIT into ONE window pass —
    * `row_number() OVER (PARTITION BY o_custkey ORDER BY …) <= 3` —
    * joined back on the customer key, so at 100 TB the cost is one
    * shuffle of orders by custkey, never |customer| subquery
    * re-executions. PlanSpec pins exactly that: a RunningWindowFunction
    * over the custkey partition and zero nested-loop operators. Exact
    * integer cents + the orderkey tiebreak make the per-customer
    * frontier deterministic cross-engine. */
  def lateralTopOrders(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "customer"); view(s, dir, "orders")
    s.sql(
      """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
        |  t.totalprice_c
        |FROM sq_customer c
        |JOIN LATERAL (
        |  SELECT o.o_orderkey,
        |    cast(round(o.o_totalprice * 100, 0) as bigint)
        |      AS totalprice_c
        |  FROM sq_orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY cast(round(o.o_totalprice * 100, 0) as bigint) DESC,
        |    o.o_orderkey
        |  LIMIT 3) t""".stripMargin)
  }
}
