package graft

import graft.sim.LshCosine
import org.apache.spark.sql.functions._

import scala.util.Random

/** Hyperplane-LSH ANN: bucket determinism, guaranteed collision of
  * identical vectors, and recall against exact brute-force cosine on
  * clustered data (the same generator as SimIvfSpec, padded to the index
  * dimension so every hyperplane entry participates). */
class SimLshSpec extends SparkSpec {
  import spark.implicits._

  // 8 well-separated clusters in 64-d, 40 points each, seed 7.
  private lazy val clustered = {
    val rnd = new Random(7)
    val centers = Array.fill(8, LshCosine.Dim)(rnd.nextGaussian() * 5)
    val rows = for {
      c <- 0 until 8
      i <- 0 until 40
    } yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.3).toFloat)
      ((c * 40 + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def quantize(df: org.apache.spark.sql.DataFrame) = {
    graft.functions.SignatureExpressions.register(spark, 64,
      Array(1L), Array(0L), 2147483647L)
    df.withColumn("q", expr(
        "transform(embedding, x -> " +
          "cast(round(cast(x as double) * 1000000, 0) as bigint))"))
      .withColumn("n", expr("graft_dot(q, q)"))
      .select("vec_id", "q", "n")
  }

  test("buckets are deterministic and identical vectors always collide") {
    val dup = clustered.union(
      clustered.filter(col("vec_id") === 0)
        .withColumn("vec_id", lit(1000L)))
    val b = LshCosine.buckets(quantize(dup))
      .as[(Long, Int, Long)].collect()
    val b2 = LshCosine.buckets(quantize(dup))
      .as[(Long, Int, Long)].collect()
    assert(b.toSet == b2.toSet)
    assert(b.length == dup.count() * LshCosine.Tables)
    val byVec = b.groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(byVec(0L) == byVec(1000L), "exact copy must share every bucket")
  }

  test("LSH recall@5 vs brute force on clustered data") {
    val qz = quantize(clustered)
    val lsh = LshCosine.topKFrom(qz, nQueries = 8 * 40, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // brute force with the identical quantized scoring
    val q = qz.select(col("vec_id").as("query_id"), col("q").as("qv"),
      col("n").as("qn"))
    val c = qz.select(col("vec_id").as("neighbor_id"), col("q").as("cv"),
      col("n").as("cn"))
    val truth = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", expr("graft_dot(qv, cv)"))
      .withColumn("cosine", col("dot").cast("double") /
        (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double"))))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rn") <= 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val recalls = truth.map { case (qid, t) =>
      lsh.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
    }
    val meanRecall = recalls.sum / recalls.size
    // within-cluster neighbors are near-parallel (tiny angle -> near-1
    // per-bit agreement), so table collisions are near-certain
    assert(meanRecall >= 0.9, s"recall $meanRecall too low")
  }
}
