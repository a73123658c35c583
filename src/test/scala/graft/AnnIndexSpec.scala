package graft

import graft.sim.{IvfCosine, ProductQuantizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Window
import org.apache.spark.sql.functions._

/** The ANN serving split: a persisted index queried without retraining.
  *
  * Two contracts per index family:
  *   1. parity — the indexed query returns exactly the inline query's
  *      rows (training moved, semantics didn't);
  *   2. plan — the query phase is an index scan + probe join ONLY:
  *      the optimized plan reads the index directory and carries no
  *      training stages (pinned via Window-node counts — assignment
  *      windows exist only in the build phase).
  */
class AnnIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def windows(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case w: Window => w }.size

  /** Root paths of every file scan in the optimized plan. */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("IVF: indexed serving matches inline topK; plan is index scan " +
      "+ probe join (2 windows: probe top-nprobe, final rank)") {
    val idx = tmpDir("ivf-index")
    IvfCosine.buildIndex(spark, dir, idx, nlist = 16, iters = 3)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val inline = IvfCosine.topK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", nlist = 16, nprobe = 12, k = 5)
    val served = IvfCosine.topKIndexed(spark, dir, idx,
      nQueries = 10, nprobe = 12, k = 5)
    assert(rows(served) == rows(inline))
    // Training-free query plan: the inline path carries an extra
    // assignment window (3+); the served path exactly the two query-side
    // ones.
    assert(windows(served) == 2)
    assert(windows(inline) >= 3)
    val paths = scanPaths(served)
    assert(paths.exists(_.contains(s"$idx/postings")) &&
      paths.exists(_.contains(s"$idx/centroids")))
  }

  test("IVF: postings are partitioned by cluster_id (the pruning key)") {
    val idx = tmpDir("ivf-index-layout")
    IvfCosine.buildIndex(spark, dir, idx, nlist = 16, iters = 3)
    val lists = new java.io.File(s"$idx/postings").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cluster_id="))
    assert(lists.nonEmpty, "inverted lists materialize as partitions")
    // A single-list read touches one partition directory's files only.
    val one = spark.read.parquet(s"$idx/postings")
      .filter(col("cluster_id") === 0)
    val scanned = one.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters: [isnotnull(cluster_id"),
      "list filter prunes at the scan")
  }

  test("PQ: indexed serving matches inline topK; query plan has no " +
      "training (1 window: final rank)") {
    val idx = tmpDir("pq-index")
    ProductQuantizer.buildIndex(spark, dir, idx)
    val inline = ProductQuantizer.topK(spark, dir)
    val served = ProductQuantizer.topKIndexed(spark, dir, idx)
    assert(rows(served) == rows(inline))
    assert(windows(served) == 1)
    val paths = scanPaths(served)
    assert(paths.exists(_.contains(s"$idx/books")) &&
      paths.exists(_.contains(s"$idx/codes")))
  }

  test("IVF-PQ: nprobe=nlist equals plain PQ exactly; nprobe=4 returns " +
      "only probed-list members; plan is training-free (2 windows) " +
      "over the partitioned codes") {
    val idx = tmpDir("ivfpq-index")
    graft.sim.IvfPq.buildIndex(spark, dir, idx, nlist = 16)
    // Covering limit: with every list probed the composed index IS
    // plain PQ — codebooks and code assignments are shared.
    val inline = ProductQuantizer.topK(spark, dir)
    val covering = graft.sim.IvfPq.topKIndexed(spark, dir, idx,
      nQueries = 10, nprobe = 16, k = 5)
    assert(rows(covering) == rows(inline))

    // The registered nprobe=4 contract: deterministic, and every
    // returned neighbor lives in one of its query's 4 probed lists.
    val served = graft.sim.IvfPq.topKIndexed(spark, dir, idx,
      nQueries = 10, nprobe = 4, k = 5)
    assert(served.count() > 0)
    assert(rows(served) == rows(graft.sim.IvfPq.topKIndexed(
      spark, dir, idx, nQueries = 10, nprobe = 4, k = 5)))
    // Each query's results span at most nprobe coarse lists.
    val member = spark.read.parquet(s"$idx/codes")
      .select(col("neighbor_id"), col("cluster_id")).distinct()
    val spread = served.join(member, Seq("neighbor_id"))
      .groupBy(col("query_id"))
      .agg(org.apache.spark.sql.functions
        .countDistinct(col("cluster_id")).as("nc"))
    assert(spread.filter(col("nc") > 4).isEmpty,
      "a result outside the query's probed lists")

    assert(windows(served) == 2) // probe top-nprobe + final rank
    val paths = scanPaths(served)
    assert(paths.exists(_.contains(s"$idx/centroids")) &&
      paths.exists(_.contains(s"$idx/books")) &&
      paths.exists(_.contains(s"$idx/codes")))
    // The codes layout is list-partitioned and the probe join keys on
    // the partition column, so the codes scan prunes to probed lists.
    val lists = new java.io.File(s"$idx/codes").listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("cluster_id="))
    assert(lists.nonEmpty, "codes materialize as per-list partitions")
    val physical = served.queryExecution.executedPlan.toString
    assert(physical.contains("dynamicpruning") ||
      physical.contains("PartitionFilters: [isnotnull(cluster_id"),
      "probed-list pruning reaches the codes scan")
  }

  test("IVF-PQ: a reduced-nprobe query scans fewer code rows (the " +
      "pruning is real, not cosmetic)") {
    val idx = tmpDir("ivfpq-prune")
    graft.sim.IvfPq.buildIndex(spark, dir, idx, nlist = 16)
    // One coarse list per query: candidate rows must be a strict subset
    // of the full (covering) probe's candidates.
    val narrow = graft.sim.IvfPq.topKIndexed(spark, dir, idx,
      nQueries = 10, nprobe = 1, k = 1000)
    val covering = graft.sim.IvfPq.topKIndexed(spark, dir, idx,
      nQueries = 10, nprobe = 16, k = 1000)
    val n = narrow.count()
    val c = covering.count()
    assert(n > 0 && n < c, s"nprobe=1 candidates ($n) < nprobe=16 ($c)")
  }

  test("IVF delta maintenance: incrementally-grown index == frozen-" +
      "codebook full build, and covering query == full-corpus index") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 5 =!= 4)
    val delta = emb.filter(col("vec_id") % 5 === 4)
    // Incrementally grown: train on the base, append the delta.
    val grown = tmpDir("ivf-grown")
    IvfCosine.buildIndexVectors(spark, base, grown, nlist = 16, iters = 3)
    IvfCosine.appendDelta(spark, grown, delta)
    // Reference at the SAME (frozen) codebook: rebuild the postings
    // from the full corpus against the grown index's stored centroids.
    val ref = tmpDir("ivf-ref")
    IvfCosine.buildIndexVectors(spark, base, ref, nlist = 16, iters = 3)
    IvfCosine.appendDelta(spark, ref, emb) // full corpus as "delta"
    assert(rows(spark.read.parquet(s"$grown/postings")) ==
      rows(spark.read.parquet(s"$ref/postings")),
      "incremental postings diverged from the frozen-codebook rebuild")
    // Covering-nprobe query over the grown index == brute force
    // (regardless of which corpus the codebook saw).
    val served = IvfCosine.topKIndexed(spark, dir, grown,
      nQueries = 10, nprobe = 16, k = 5)
    val brute = graft.sim.Similarity.cosineTopK(spark, dir)
    assert(rows(served) == rows(brute))
  }

  test("IVF delta maintenance: retried delta converges; a re-embedded " +
      "vector MOVES lists (old posting row drops)") {
    import spark.implicits._
    def vec(xs: Double*) = xs.map(_.toFloat).toArray
    // Two well-separated directions; 3 base vectors per side.
    val base = Seq(
      (0L, vec(1, 0)), (1L, vec(0.9, 0.1)), (2L, vec(1, 0.05)),
      (3L, vec(0, 1)), (4L, vec(0.1, 0.9)), (5L, vec(0.05, 1)))
      .toDF("vec_id", "embedding")
    val idx = tmpDir("ivf-move")
    IvfCosine.buildIndexVectors(spark, base, idx, nlist = 2, iters = 3)
    def postings = spark.read.parquet(s"$idx/postings")
    def listOf(id: Long): Seq[Int] = postings
      .filter(col("neighbor_id") === id)
      .select(col("cluster_id")).collect().map(_.getInt(0)).toSeq
    val before = listOf(0L)
    assert(before.size == 1)
    // Re-embed vector 0 onto the OTHER side; append twice (retry).
    val moved = Seq((0L, vec(0.02, 1))).toDF("vec_id", "embedding")
    IvfCosine.appendDelta(spark, idx, moved)
    val total = postings.count()
    IvfCosine.appendDelta(spark, idx, moved) // retried batch
    assert(postings.count() == total, "retry duplicated posting rows")
    val after = listOf(0L)
    assert(after.size == 1 && after != before,
      s"re-embedded vector did not move lists: $before -> $after")
  }
}
