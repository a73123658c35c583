package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed IVF-PQ index — the layout a 100 TB ANN corpus actually
  * ships (Jégou et al., TPAMI 2011 §V; the FAISS `IVFxx,PQyy` factory
  * string). The two serving indexes compose their complementary levers:
  *
  *   - IVF prunes WHICH rows are scanned: the PQ code table is
  *     partitioned by the coarse (IVF) list id, so the probe join reads
  *     only the probed nprobe/nlist of the codes — the plain PQ serving
  *     layout ([[ProductQuantizer.buildIndex]]) must scan every
  *     candidate's codes by design;
  *   - PQ shrinks WHAT each scanned row costs: M one-byte-ish codes
  *     (32× compression) scored by a broadcast ADC join, instead of the
  *     raw vectors the plain IVF postings carry.
  *
  * The coarse quantizer is trained in the SAME metric and space as the
  * ADC scoring — integer squared-L2 over the micro-unit-quantized
  * vectors (seeded from the first nlist ids, one integer-mean Lloyd
  * refinement: the [[ProductQuantizer.trainedBooks]] recipe at full
  * dimension). Metric consistency is what makes small nprobe cover: a
  * cosine coarse quantizer (measured) needs 15/16 lists at sf0.1
  * because ADC ranks by L2 while the probe ranks by angle; the L2
  * coarse ordering agrees with ADC, so the probed lists contain the
  * ADC top-k at a fraction of the lists.
  *
  * Persisted layout ([[buildIndex]]):
  *
  *   `indexDir/centroids/`              (cluster_id, cv, cvn) — nlist
  *                                      coarse centroids, broadcast;
  *   `indexDir/books/`                  (s, code, cv, cvn) — M·K PQ
  *                                      codebook rows, broadcast;
  *   `indexDir/codes/cluster_id=<c>/`   (neighbor_id, s, code) — the
  *                                      32×-compressed corpus encoding,
  *                                      PARTITIONED by coarse list.
  *
  * The PQ codebooks and code assignments are IDENTICAL to the plain PQ
  * index (trained corpus-wide, before the IVF split), so the composed
  * query's scores equal plain ADC scores and the same deterministic
  * pqTopK oracle applies whenever the probed lists cover the ADC top-k
  * (the covering-nprobe contract of `sim_ivf_indexed`, verified at the
  * harness scales; AnnIndexSpec pins parity and the pruned plan).
  * Everything is integer-exact end-to-end — no doubles in training,
  * assignment, probing or scoring — so results are deterministic
  * across runs and partitionings.
  */
object IvfPq {

  import ProductQuantizer.{M, SubDim}

  private def registerFns(s: SparkSession): Unit =
    graft.functions.SignatureExpressions.register(
      s, 64, Array(1L), Array(0L), 2147483647L)

  /** The PQ-encodable corpus (full-dimension vectors, the pqTopK
    * oracle's `len(q) = 64` contract) with integer squared norms. */
  private def qVecs(s: SparkSession, dir: String): DataFrame =
    Similarity.quantized(s, dir).select("vec_id", "q")
      .filter(size(col("q")) === M * SubDim)
      .withColumn("qn", expr("graft_dot(q, q)"))

  /** Top-n coarse lists per vector by integer squared-L2
    * |x−c|² = x·x − 2x·c + c·c; ties break to the lowest cluster_id.
    * Output: (vec_id, cluster_id) — n rows per vector. */
  private def coarseRank(vecs: DataFrame, cents: DataFrame,
                         n: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2").asc, col("cluster_id").asc)
    vecs.crossJoin(broadcast(cents))
      .withColumn("dot", expr("graft_dot(q, cv)"))
      .withColumn("d2",
        col("qn") - lit(2L) * col("dot") + col("cvn"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .select(col("vec_id"), col("cluster_id"))
  }

  /** Coarse centroids: seeds = the first nlist vectors by id (codes =
    * their ranks), one integer-mean Lloyd refinement — the
    * [[ProductQuantizer.trainedBooks]] recipe at full dimension, in the
    * exact space ADC scores in. (cluster_id, cv, cvn). */
  private def trainCoarse(vecs: DataFrame, nlist: Int): DataFrame = {
    import vecs.sparkSession.implicits._
    val seedRanks = vecs.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(nlist).collect().map(_.getLong(0))
      .sorted.zipWithIndex.toSeq.toDF("vec_id", "cluster_id")
    val seeds = vecs.join(broadcast(seedRanks), Seq("vec_id"))
      .select(col("cluster_id"), col("q").as("cv"),
        col("qn").as("cvn"))
    val a0 = coarseRank(vecs, seeds, 1)
    a0.join(vecs, Seq("vec_id"))
      .select(col("cluster_id"), posexplode_outer(col("q"))
        .as(Seq("dim", "x")))
      .filter(col("dim").isNotNull)
      .groupBy(col("cluster_id"), col("dim"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("c"))
      .withColumn("mx",
        expr("cast(round(cast(sx as double) / c, 0) as bigint)"))
      .groupBy(col("cluster_id"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, mx))), " +
        "p -> p.mx)").as("cv"))
      .withColumn("cvn", expr("graft_dot(cv, cv)"))
  }

  /** Train both quantizers corpus-wide and persist the composed layout.
    * Every PQ-encodable vector — zero-norm included — gets a coarse
    * list, so the composed index ranks exactly the rows plain PQ
    * ranks. */
  def buildIndex(s: SparkSession, dir: String, indexDir: String,
                 nlist: Int = 16): Unit = {
    registerFns(s)
    val vecs = qVecs(s, dir).persist()
    val sub = ProductQuantizer.subVectors(vecs.select("vec_id", "q"))
      .withColumn("svn", expr("graft_dot(sv, sv)"))
      .persist()
    try {
      val books = ProductQuantizer.trainedBooks(sub)
      books.write.mode("overwrite").parquet(s"$indexDir/books")
      val codes = ProductQuantizer
        .assign(sub, s.read.parquet(s"$indexDir/books"))
        .withColumnRenamed("vec_id", "neighbor_id")

      val centroids = trainCoarse(vecs, nlist)
      centroids.write.mode("overwrite").parquet(s"$indexDir/centroids")
      val coarse = coarseRank(vecs,
          s.read.parquet(s"$indexDir/centroids"), 1)
        .withColumnRenamed("vec_id", "neighbor_id")
      codes.join(coarse, Seq("neighbor_id"))
        .write.mode("overwrite").partitionBy("cluster_id")
        .parquet(s"$indexDir/codes")
    } finally { sub.unpersist(); vecs.unpersist() }
  }

  /** Query phase against a persisted [[buildIndex]] layout: rank the
    * broadcast coarse centroids per query (same integer L2 as ADC),
    * build the per-query ADC tables from the persisted books, then
    * score ONLY the probed partitions of the code table — the
    * broadcast join keys on the partition column, so dynamic partition
    * pruning drops the un-probed lists at the codes scan (AnnIndexSpec
    * pins the pruning in the physical plan). Two Window nodes total:
    * the probe top-nprobe and the final rank — no training, no
    * assignment. */
  def topKIndexed(s: SparkSession, dir: String, indexDir: String,
                  nQueries: Int = 10, nprobe: Int = 4,
                  k: Int = 5): DataFrame = {
    registerFns(s)
    val centroids = s.read.parquet(s"$indexDir/centroids")
    val books = s.read.parquet(s"$indexDir/books")
    val codes = s.read.parquet(s"$indexDir/codes")

    val qv = qVecs(s, dir).filter(col("vec_id") < nQueries)
    val probes = coarseRank(qv, centroids, nprobe)
      .withColumnRenamed("vec_id", "query_id")

    val qt = ProductQuantizer.subVectors(qv.select("vec_id", "q"))
      .withColumn("svn", expr("graft_dot(sv, sv)"))
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(books), Seq("s"))
      .withColumn("dot", expr("graft_dot(sv, cv)"))
      .withColumn("qd", ProductQuantizer.dist2("svn", "cvn", "dot"))
      .select("query_id", "s", "code", "qd")

    // nQueries × nprobe × M × K rows — the per-query ADC tables
    // replicated onto each probed list; tiny, and carrying cluster_id
    // on the broadcast side is what arms partition pruning on the scan.
    val probeQt = probes.join(qt, Seq("query_id"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_d2").asc, col("neighbor_id"))
    codes.join(broadcast(probeQt), Seq("cluster_id", "s", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("qd")).as("approx_d2"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "approx_d2", "rank")
  }
}
