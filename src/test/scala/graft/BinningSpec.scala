package graft

import graft.ops.Binning
import org.apache.spark.sql.functions._

/** Exact equi-depth binning: the two-level prefix-sum rank must equal a
  * flat total-order rank, bins must balance to within one row, and the
  * stats must be internally consistent. */
class BinningSpec extends SparkSpec {

  test("bin sizes are equi-depth: differ by at most one row") {
    val bins = Binning.equiDepthBins(spark, "/root/testdata/sf0.001")
      .collect()
    assert(bins.length == 10)
    val sizes = bins.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 1,
      s"bin sizes not balanced: ${sizes.mkString(",")}")
  }

  test("bin value spans are ordered and total count matches the input") {
    val dir = "/root/testdata/sf0.001"
    val bins = Binning.equiDepthBins(spark, dir)
      .orderBy(col("bin")).collect()
    // Non-overlapping, ordered spans: bin b's max <= bin b+1's min.
    bins.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("price_hi") <= b.getAs[Double]("price_lo"),
          s"bins overlap: ${a} / ${b}")
      case _ =>
    }
    val n = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_extendedprice").isNotNull).count()
    assert(bins.map(_.getAs[Long]("n_rows")).sum == n)
  }

  test("empty input yields an empty, correctly-typed frame") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Long, Int)]
      .toDF("price", "l_orderkey", "l_linenumber")
    val out = graft.ops.Binning.equiDepthBinsOf(empty, 10)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("bin", "n_rows", "price_lo", "price_hi", "cents_sum"))
  }

  test("property: random frames (heavy ties included) bin exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val n = 50 + rnd.nextInt(400)
      // Draw from a SMALL value set so ties — including cross-stratum
      // boundary values — are common, and a one-value degenerate trial.
      val domain =
        if (trial == 8) Array(42.0)
        else Array.fill(3 + rnd.nextInt(10))(
          math.round(rnd.nextDouble() * 1000) / 10.0)
      val rows = (0 until n).map(i =>
        (domain(rnd.nextInt(domain.length)), i.toLong, i))
      val df = rows.toDF("price", "l_orderkey", "l_linenumber")
      val k = 2 + rnd.nextInt(9)
      val got = graft.ops.Binning.equiDepthBinsOf(df, k).collect()
        .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_rows")).toMap
      val expected = rows.sortBy(r => (r._1, r._2, r._3)).zipWithIndex
        .groupBy { case (_, i) => i.toLong * k / n }
        .map { case (b, g) => b -> g.size.toLong }
      assert(got == expected, s"trial $trial k=$k n=$n")
      val sizes = got.values
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("two-level stratified rank equals the flat total-order rank") {
    // Rebuild bin assignment with a deliberately tiny k over sf0.001 and
    // compare against the naive single-order formulation computed via a
    // driver-side sort (test-only; the engine never plans this).
    val dir = "/root/testdata/sf0.001"
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_extendedprice").as("price"), col("l_orderkey"),
        col("l_linenumber"))
      .filter(col("price").isNotNull)
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getInt(2)))
      .sortBy(identity)
    val n = rows.length.toLong
    val expected = rows.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10L / n }
      .map { case (bin, g) => bin -> g.length.toLong }
    val got = Binning.equiDepthBins(spark, dir).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_rows")).toMap
    assert(got == expected)
  }
}
