package graft

import org.apache.spark.sql.SparkSession

/** Stage-level profiling main (diagnostics, not part of the harness
  * contract): times labeled sub-plans of the expensive queries so a round
  * can see WHERE the seconds go before optimizing. Usage:
  *   graft.Profile [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.DataFrame

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def force(df: DataFrame): Long = df.write.format("noop")
      .mode("overwrite").save().asInstanceOf[Any] match { case _ => 0L }

    // Scan parallelism of the single-file inputs.
    val ev = graft.ingest.Events.raw(spark, sfDir)
    println(s"[profile] events scan partitions = ${ev.rdd.getNumPartitions}, rows = ${ev.count()}")

    time("json_props_agg")(force(graft.ops.EventOps.jsonPropsAgg(spark, sfDir)))

    // The REGISTERED clusters() path, stage-timed as its jobs actually
    // run (AutoArm decision → one arm → confirm → components).
    if (sys.env.contains("SPARK_GRAFT_PROFILE_MINHASH")) {
      import graft.text.MinHashDedup._
      val d2 = spark.read.parquet(s"$sfDir/documents.parquet")
      val s2 = time("mh sigs cache+stats") {
        val s = signatures(d2).cache(); s.count(); s
      }
      val arm = time("mh selectArm estimate")(selectArm(s2, 0.6, 5000L))
      println(s"[profile]   arm = $arm")
      val conf = time("mh cands+confirm count") {
        val e = confirmedEdges(s2, candidateEdges(s2), 0.6).persist()
        println(s"  confirmed = ${e.count()}"); e
      }
      time("mh components+assign")(
        force(components(d2.select("doc_id"), conf)))
      time("mh clusters() e2e")(force(clusters(spark, sfDir)))
      spark.catalog.clearCache()
    }

    // MinHash stages, separately materialized.
    import graft.text.MinHashDedup._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigs = time("signatures+cache") {
      val s = signatures(docs).cache(); s.count(); s
    }
    val lshEdges = time("lsh candidateEdges") {
      val e = candidateEdges(sigs).cache(); println(s"  lsh cands = ${e.count()}"); e
    }
    val pre = time("prefixCandidates") {
      val p = prefixCandidates(sigs, 0.6).cache(); println(s"  prefix cands = ${p.count()}"); p
    }
    val conf = time("confirm (union)") {
      val c = confirmedEdges(sigs, lshEdges.unionByName(pre), 0.6).cache()
      println(s"  confirmed = ${c.count()}"); c
    }
    time("components")(force(components(sigs.select("doc_id"), conf)))

    // IVF-PQ covering-nprobe scan (round-8): smallest nprobe whose
    // composed result equals plain PQ, per SF dir.
    if (sys.env.contains("SPARK_GRAFT_PROFILE_IVFPQ")) {
      val idx = s"/tmp/graft-ivfpq-scan/${new java.io.File(sfDir).getName}"
      graft.sim.IvfPq.buildIndex(spark, sfDir, idx, nlist = 16)
      val plain = graft.sim.ProductQuantizer.topK(spark, sfDir)
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
      for (np <- 1 to 16) {
        val got = graft.sim.IvfPq.topKIndexed(spark, sfDir, idx,
            nQueries = 10, nprobe = np, k = 5)
          .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
        println(s"[profile] ivfpq nprobe=$np covering=${got == plain} " +
          s"missing=${(plain -- got).size}")
      }
    }

    // Gold country/webtoon branch timings (round-8 Expand-removal work).
    if (sys.env.contains("SPARK_GRAFT_PROFILE_GOLD")) {
      import org.apache.spark.sql.functions._
      val sess = time("silver materialize") {
        val x = graft.silver.Sessionize
          .sessions(graft.ingest.Events.cleansed(spark, sfDir)).persist()
        x.count(); x
      }
      time("country perPair+sums") {
        force(sess.groupBy(col("datetime"), col("country"), col("user_id"),
            col("webtoon_id"), col("episode_id"))
          .agg(count(lit(1)).as("p_rows"))
          .groupBy(col("datetime"), col("country"))
          .agg(count(lit(1)).as("pairs"), sum(col("p_rows")).as("n")))
      }
      time("country perUserS cascade") {
        force(sess.select(col("datetime"), col("country"), col("user_id"),
            col("session_id")).distinct()
          .groupBy(col("datetime"), col("country"), col("user_id"))
          .agg(count(lit(1)).as("u_sessions")))
      }
      time("country full") {
        force(graft.gold.CountryDaily.build(sess))
      }
      time("webtoon full") {
        force(graft.gold.WebtoonDaily.build(sess,
          graft.gold.EpisodeDaily.build(sess)))
      }
      sess.unpersist()
    }
    spark.stop()
  }
}
