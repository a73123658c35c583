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

  test("LSH candidate arm == exact all-pairs at the 0.4 threshold") {
    val dir = "/root/testdata/sf0.001"
    val bucketed = graft.sim.Similarity
      .cosineNearDup(spark, dir, arm = graft.sim.Similarity.LshArm)
      .as[(Long, Long, Double)].collect().toSet
    val exact = graft.sim.Similarity.cosineNearDupExact(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(bucketed == exact,
      s"candidate arm missed ${(exact -- bucketed).size} qualifying pairs")
    assert(exact.nonEmpty)
  }

  test("blocked arm == exact all-pairs, and AutoArm picks it at 0.4") {
    val dir = "/root/testdata/sf0.001"
    // AutoArm at 0.4: derived (4, 59) ⇒ selectivity 59/16 ≥ 1 ⇒ the
    // registered query runs the blocked triangular scan-once plan.
    val auto = graft.sim.Similarity.cosineNearDup(spark, dir)
    val blocked = graft.sim.Similarity
      .cosineNearDup(spark, dir, arm = graft.sim.Similarity.BlockArm)
      .as[(Long, Long, Double)].collect()
    val exact = graft.sim.Similarity.cosineNearDupExact(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    // exactly-once pair scan: no duplicate output rows to rely on a
    // distinct for
    assert(blocked.length == blocked.toSet.size, "duplicate pair rows")
    assert(blocked.toSet == exact,
      s"blocked arm missed ${(exact -- blocked.toSet).size} pairs")
    assert(auto.collect().toSet ==
      blocked.map(t => org.apache.spark.sql.Row(t._1, t._2, t._3)).toSet)
    // the blocked plan must stay equi-join shaped — no nested loop
    val p = auto.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("blocked arm == brute force on random embeddings across " +
      "thresholds") {
    // seeded random vectors (not the clustered fixture): the blocked
    // triangular generator must lose nothing at any threshold, and the
    // per-pair exactly-once property must hold with hash-assigned
    // blocks over arbitrary id patterns (incl. non-dense ids)
    val rnd = new Random(11)
    val rows = (0 until 150).map { i =>
      (i.toLong * 7 + 3, Seq.fill(64)((rnd.nextGaussian()).toFloat))
    }
    val qz = quantize(rows.toDF("vec_id", "embedding"))
      .filter(col("n") > 0)
    for (t <- Seq(0.2, 0.5)) {
      val blocked = graft.sim.Similarity
        .nearDup(qz, t, graft.sim.Similarity.BlockArm)
        .as[(Long, Long, Double)].collect()
      assert(blocked.length == blocked.toSet.size,
        s"t=$t duplicate pair rows")
      val a = qz.select(col("vec_id").as("vec_a"), col("q").as("qa"),
        col("n").as("na"))
      val b = qz.select(col("vec_id").as("vec_b"), col("q").as("qb"),
        col("n").as("nb"))
      val exact = a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("dot", expr("graft_dot(qa, qb)"))
        .withColumn("cosine",
          graft.util.Num.r(col("dot").cast("double") /
            (sqrt(col("na").cast("double")) *
              sqrt(col("nb").cast("double"))), 6))
        .filter(col("cosine") >= t)
        .select("vec_a", "vec_b", "cosine")
        .as[(Long, Long, Double)].collect().toSet
      assert(blocked.toSet == exact,
        s"t=$t missed ${(exact -- blocked.toSet).size} " +
          s"invented ${(blocked.toSet -- exact).size}")
    }
  }

  test("random projection of unit vectors reads out the sign matrix") {
    // embedding e_j (1.0 at dim j) quantizes to 10^6 at j, so
    // p_i = s_ij * 10^6 — the projection must read back the exact
    // md5-parity matrix
    val dir = tmpDir("rproj")
    (0 until 64).map { j =>
      (j.toLong, Seq.tabulate(64)(d => if (d == j) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.sim.RandomProjection.project(spark, dir)
      .as[(Long, Int, Long)].collect()
      .map(r => (r._1.toInt, r._2) -> r._3).toMap
    assert(out.size == 64 * graft.sim.RandomProjection.OutDim)
    for (j <- 0 until 64; i <- 0 until graft.sim.RandomProjection.OutDim)
      assert(out((j, i)) ==
        graft.sim.RandomProjection.sign(i, j) * 1000000L,
        s"mismatch at i=$i j=$j")
  }

  test("1-NN label accuracy is perfect on well-separated clusters") {
    // 8 tight clusters, label = cluster id: every vector's nearest
    // neighbor sits in its own cluster, so per-label accuracy is 1.0
    val dir = tmpDir("knn-clusters")
    clustered
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", (col("vec_id") / 40).cast("int"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.sim.KnnEval.labelAccuracy(spark, dir)
      .select("label", "n_vectors", "n_correct", "accuracy")
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.keySet == (0 until 8).toSet)
    assert(out.values.forall(_ == ((40L, 40L, 1.0))), s"got $out")
  }

  test("KnnEval arm selection is measured, both directions") {
    // The DedupSpec pattern: the AutoArm rule itself is pinned at the
    // boundary — brute force at the budget, IVF one row past it.
    import graft.sim.KnnEval
    assert(KnnEval.selectArm(KnnEval.BruteBudget) == KnnEval.BruteArm)
    assert(KnnEval.selectArm(KnnEval.BruteBudget + 1) == KnnEval.IvfArm)
    assert(KnnEval.selectArm(1L) == KnnEval.BruteArm)
  }

  test("KnnEval IVF arm with covering nprobe == brute arm, " +
      "cell-for-cell") {
    // Covering contract: nprobe = nlist makes the probed lists the whole
    // index, so the IVF candidate set is complete and the argmax (same
    // exact scoring, same tie-break) must reproduce the brute arm
    // exactly — the same equality SimIvfSpec proves for topK.
    val dir = tmpDir("knn-arms")
    clustered
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", (col("vec_id") / 40).cast("int"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def rows(arm: graft.sim.KnnEval.Arm) =
      graft.sim.KnnEval.labelAccuracy(spark, dir, arm,
          nprobe = 8, nlist = 8)
        .select("label", "n_vectors", "n_correct", "accuracy")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val brute = rows(graft.sim.KnnEval.BruteArm)
    val ivf = rows(graft.sim.KnnEval.IvfArm)
    assert(brute == ivf, s"brute=$brute ivf=$ivf")
    assert(brute.nonEmpty)
  }

  test("KnnEval IVF arm keeps perfect accuracy at sub-covering nprobe " +
      "on clustered data") {
    // The recall contract in practice: probing 2 of 8 lists still finds
    // every same-cluster 1-NN because k-means lists align with the
    // clusters — the regime the eval presumes at corpus scale.
    val dir = tmpDir("knn-subprobe")
    clustered
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", (col("vec_id") / 40).cast("int"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.sim.KnnEval.labelAccuracy(spark, dir,
        graft.sim.KnnEval.IvfArm, nprobe = 2, nlist = 8)
      .select("label", "n_vectors", "n_correct", "accuracy")
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out.keySet == (0 until 8).toSet)
    assert(out.values.forall(_ == ((40L, 40L, 1.0))), s"got $out")
  }

  test("registered t85 query finds exactly the planted doubles at 1.0") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.sim.Similarity.cosineNearDupT85(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    val nz = graft.sim.Similarity.quantizedNonZero(spark, dir)
      .select(col("vec_id")).as[Long].collect().toSet
    val planted = nz.map(v =>
      (v, v + graft.sim.Similarity.PlantOffset, 1.0))
    assert(out == planted,
      s"planted recall must be deterministic: missed " +
        s"${(planted -- out).size}, invented ${(out -- planted).size}")
    assert(out.nonEmpty)
  }

  test("t85 planting fails loud when vec_ids reach the plant offset") {
    // A corpus whose ids touch PlantOffset would alias planted copies
    // onto real vectors — and the oracle would replay the same
    // collision, going green on a wrong answer. The guard must throw.
    val dir = tmpDir("t85-alias")
    Seq((graft.sim.Similarity.PlantOffset + 1L,
        Seq.fill(64)(1.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.sim.Similarity.cosineNearDupT85(spark, dir)
    }
    assert(e.getMessage.contains("PlantOffset"))
  }

  test("deriveParams: pinned at 0.4, selective at near-dup thresholds") {
    assert(LshCosine.deriveParams(0.4) == (4, 59))
    val (b85, t85) = LshCosine.deriveParams(0.85)
    // selectivity vs a random (cos~0) pair: T / 2^b
    assert(t85.toDouble / (1L << b85) < 0.25,
      s"tau=0.85 params ($b85,$t85) not selective")
    val (b95, t95) = LshCosine.deriveParams(0.95)
    assert(t95.toDouble / (1L << b95) < 0.02,
      s"tau=0.95 params ($b95,$t95) not selective")
  }

  test("candidate volume on a planted-dup corpus at tau=0.85 is sub-quadratic") {
    val (bits, tables) = LshCosine.deriveParams(0.85)
    val qz = quantize(clustered)
    val idx = LshCosine.bucketsFor(qz, tables, bits)
    val cands = idx.select(col("vec_id").as("vec_a"), col("tbl"),
        col("bucket"))
      .join(idx.select(col("vec_id").as("vec_b"), col("tbl"),
        col("bucket")), Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct().count()
    val n = clustered.count()
    val allPairs = n * (n - 1) / 2
    assert(cands < allPairs / 3,
      s"$cands candidates vs $allPairs all pairs — bucketing not selective")
    // ...while still covering every within-cluster near-dup pair region:
    // same-cluster points are near-parallel, so they must all collide.
    val labels = clustered.select(col("vec_id"),
      (col("vec_id") / 40).cast("int").as("cl"))
    val sameCluster = labels.select(col("vec_id").as("vec_a"),
        col("cl").as("ca"))
      .join(labels.select(col("vec_id").as("vec_b"), col("cl").as("cb")),
        col("vec_a") < col("vec_b"))
      .filter(col("ca") === col("cb")).count()
    val coveredSame = idx.select(col("vec_id").as("vec_a"), col("tbl"),
        col("bucket"))
      .join(idx.select(col("vec_id").as("vec_b"), col("tbl"),
        col("bucket")), Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b") &&
        (col("vec_a") / 40).cast("int") === (col("vec_b") / 40).cast("int"))
      .select("vec_a", "vec_b").distinct().count()
    assert(coveredSame == sameCluster,
      s"covered $coveredSame of $sameCluster same-cluster pairs")
  }
}
