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
}
