package graft

import graft.tpch.AggExtOps

/** Pins the delimiter-safety contract of the ordered LISTAGG face:
  * `n_nations` counts distinct group MEMBERS (pre-distinct subquery +
  * count(1)), so a delimiter character inside a member name cannot
  * inflate it — the failure mode of the earlier
  * `size(split(nations, ','))` derivation. */
class AggExtSpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def df(schema: StructType, rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

  test("comma inside a nation name does not inflate n_nations") {
    val customer = df(
      StructType(Seq(
        StructField("c_mktsegment", StringType),
        StructField("c_nationkey", LongType))),
      Seq(
        Row("BUILDING", 1L), Row("BUILDING", 2L), Row("BUILDING", 2L),
        Row("MACHINERY", 3L)))
    val nation = df(
      StructType(Seq(
        StructField("n_nationkey", LongType),
        StructField("n_name", StringType))),
      Seq(
        Row(1L, "KOREA, REPUBLIC OF"), // planted delimiter in the name
        Row(2L, "JAPAN"),
        Row(3L, "FRANCE")))

    val out = AggExtOps.listAggNationsFrom(spark, customer, nation)
      .collect().map(r =>
        r.getString(0) -> (r.getString(1), r.getLong(2))).toMap

    // Two distinct nations, even though the joined string splits into
    // three comma-separated tokens.
    assert(out("BUILDING") === (("JAPAN,KOREA, REPUBLIC OF", 2L)))
    assert(out("MACHINERY") === (("FRANCE", 1L)))
  }

  test("duplicate customer rows collapse before aggregation") {
    val customer = df(
      StructType(Seq(
        StructField("c_mktsegment", StringType),
        StructField("c_nationkey", LongType))),
      Seq.fill(5)(Row("AUTOMOBILE", 7L)))
    val nation = df(
      StructType(Seq(
        StructField("n_nationkey", LongType),
        StructField("n_name", StringType))),
      Seq(Row(7L, "PERU")))
    val out = AggExtOps.listAggNationsFrom(spark, customer, nation).collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === "PERU")
    assert(out.head.getLong(2) === 1L)
  }
}
