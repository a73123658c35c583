package graft

import graft.sim.ProductQuantizer
import org.apache.spark.sql.functions._

/** PQ index behavior on synthetic clustered data: the approximation must
  * retrieve same-blob neighbors (recall is a measured property, not part
  * of the registered contract) and be deterministic. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = tmpDir("pq")
    val dim = 64
    // Two tight orthogonal blobs (even ids on axis 0, odd on axis 32);
    // seeds vec_id < 16 cover both.
    val rows = (0 until 60).map { i =>
      val v = Array.fill(dim)(0.001f * ((i % 7) + 1))
      v(if (i % 2 == 0) 0 else 32) = 1.0f
      (i.toLong, v.toSeq, i % 2)
    }
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("ADC top-k retrieves same-blob neighbors on separable data") {
    val out = ProductQuantizer.topK(spark, dir).collect()
    assert(out.nonEmpty)
    // query parity == neighbor parity for every returned row: the PQ
    // approximation must never prefer the orthogonal blob
    assert(out.forall(r => r.getLong(0) % 2 == r.getLong(1) % 2),
      "a cross-blob neighbor outranked a same-blob one")
    // every query returns a full k
    val counts = out.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(counts.values.forall(_ == 5))
  }

  test("encoding and scoring are deterministic") {
    val a = ProductQuantizer.topK(spark, dir).orderBy("query_id", "rank")
      .collect()
    val b = ProductQuantizer.topK(spark, dir).orderBy("query_id", "rank")
      .collect()
    assert(a.sameElements(b))
  }
}
