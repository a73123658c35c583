package graft

import graft.tpch.SubqueryOps
import org.apache.spark.sql.functions._

/** The null-aware NOT IN semantics the q16 query exists to carry: under
  * three-valued logic one NULL in the inner relation makes
  * `x NOT IN (...)` UNKNOWN for EVERY x — the whole result empties —
  * while the NOT EXISTS phrasing of the same business question just
  * skips the NULL row. A SQL user who migrates a NOT IN query onto an
  * engine that silently planned it as NOT EXISTS gets different rows;
  * this suite plants the NULL and pins both behaviors. */
class SubquerySemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("a planted NULL in the inner relation empties NOT IN but not " +
      "NOT EXISTS; removing it restores the reduced result") {
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("nn_cust")
    // Inner holds {1, NULL}: customer 1 is IN (excluded either way);
    // customers 2 and 3 compare UNKNOWN against the NULL.
    Seq(Some(1L), None).toDF("ck").createOrReplaceTempView("nn_ord")

    val notIn = spark.sql(
      "SELECT k FROM nn_cust WHERE k NOT IN (SELECT ck FROM nn_ord)")
    assert(notIn.count() == 0L,
      "one NULL inner value must empty the NOT IN result")

    val notExists = spark.sql(
      """SELECT k FROM nn_cust WHERE NOT EXISTS (
        |  SELECT 1 FROM nn_ord o WHERE o.ck = nn_cust.k)""".stripMargin)
    assert(notExists.as[Long].collect().toSet == Set(2L, 3L),
      "NOT EXISTS must skip the NULL row, not reject everything")

    // NULL removed: NOT IN returns the reduced (normal) result.
    Seq(Some(1L)).toDF("ck").createOrReplaceTempView("nn_ord")
    val reduced = spark.sql(
      "SELECT k FROM nn_cust WHERE k NOT IN (SELECT ck FROM nn_ord)")
    assert(reduced.as[Long].collect().toSet == Set(2L, 3L))
  }

  test("q16 (NOT IN) and its NOT EXISTS twin agree on the harness data " +
      "- the inner is NULL-free there, so only the plan differs") {
    val dir = "/root/testdata/sf0.001"
    val notIn = SubqueryOps.q16IdleCustomersNotIn(spark, dir)
    val notExists = spark.sql(
      """SELECT c.c_mktsegment AS segment, count(1) AS n_idle
        |FROM sq_customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM sq_orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c.c_mktsegment""".stripMargin)
    val cols = Seq(col("segment"), col("n_idle"))
    assert(notIn.select(cols: _*).exceptAll(notExists.select(cols: _*))
      .isEmpty &&
      notExists.select(cols: _*).exceptAll(notIn.select(cols: _*)).isEmpty)
    assert(notIn.count() > 0, "harness data must keep the query non-trivial")
  }
}
