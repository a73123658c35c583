package graft

import graft.text.CorpusOps
import org.apache.spark.sql.functions._

/** Bloom-pruned decontamination: exact-output equivalence with the
  * baseline plan, and the one-sided-error property that makes the
  * pruning safe. */
class DecontaminateBloomSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bloom plan output == baseline plan output, cell for cell") {
    val cols = Seq("doc_id", "lang", "source", "n_grams",
      "n_contaminated", "is_contaminated").map(col)
    val base = CorpusOps.decontaminate(spark, dir).select(cols: _*)
    val bloom = CorpusOps.decontaminateBloom(spark, dir).select(cols: _*)
    assert(base.count() > 0)
    assert(base.exceptAll(bloom).isEmpty && bloom.exceptAll(base).isEmpty,
      "bloom-pruned output diverged from the exact baseline")
  }

  test("pruning is one-sided: every true benchmark gram survives") {
    // Build the filter exactly as the operator does, then check that NO
    // gram present in the benchmark set is ever dropped (false
    // negatives are impossible by Bloom construction; this pins the
    // wiring — same hash domain on both sides).
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val bench = d.filter(col("source") === "src0")
    val benchGrams = CorpusOps.gramSigs(bench, 5)
      .select(explode_outer(col("grams")).as("gh"))
      .filter(col("gh").isNotNull).distinct()
    val n = benchGrams.count()
    val bf = benchGrams.stat.bloomFilter("gh", math.max(n, 1), 0.01)
    val dropped = benchGrams.collect()
      .count(r => !bf.mightContainLong(r.getLong(0)))
    assert(dropped == 0, s"$dropped benchmark grams dropped by the filter")
  }
}
