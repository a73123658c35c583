package graft

import graft.sim.{IvfCosine, Similarity}
import org.apache.spark.sql.functions._

import scala.util.Random

/** IVF ANN verified against exact brute-force cosine on deterministic
  * clustered data (seeded): recall@5 must be high when probing the right
  * lists, and every returned cosine must match the exact score. */
class SimIvfSpec extends SparkSpec {
  import spark.implicits._

  // 8 well-separated clusters in 16-d, 40 points each, seed 7.
  private lazy val clustered = {
    val rnd = new Random(7)
    val centers = Array.fill(8, 16)(rnd.nextGaussian() * 5)
    val rows = for {
      c <- 0 until 8
      i <- 0 until 40
    } yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.3).toFloat)
      ((c * 40 + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("IVF recall@5 vs brute force on clustered data") {
    val queries = clustered.filter(col("vec_id") % 40 === 0) // 8 queries
    val ivf = IvfCosine.topK(clustered, queries, "vec_id", "embedding",
      nlist = 8, nprobe = 2, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // brute force on the same normalized-dot definition
    val nv = clustered.withColumn("v",
        expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm", expr("sqrt(aggregate(v, 0D, (a, x) -> a + x*x))"))
      .withColumn("nv", expr("transform(v, x -> x / nrm)"))
      .select(col("vec_id"), col("nv"))
    val q = nv.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("query_id"), col("nv").as("qv"))
    val exact = q.crossJoin(nv.select(col("vec_id").as("neighbor_id"),
        col("nv").as("cv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", expr(
        "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (a, v) -> a + v)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rn") <= 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val recalls = exact.map { case (qid, truth) =>
      ivf.getOrElse(qid, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.9, s"recall $meanRecall too low: $recalls")
  }

  test("brute-force baseline over harness embeddings is well-formed") {
    val out = Similarity.cosineTopK(spark, "/root/testdata/sf0.001",
      nQueries = 3, k = 4).collect()
    assert(out.length == 12) // 3 queries x 4 neighbors
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rows =>
      val cos = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b },
        "cosines must be non-increasing in rank")
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }
}
