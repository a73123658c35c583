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
}
