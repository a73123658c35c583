package graft.sim

import org.apache.spark.sql.SparkSession

/** Locations + build-once gating for persisted ANN serving indexes
  * ([[IvfCosine.buildIndex]], [[ProductQuantizer.buildIndex]]).
  *
  * The serving contract is index-once / query-many: training (Lloyd
  * iterations, codebooks, assignments) happens in `build*`; the
  * registered `*_indexed` queries only READ the persisted layout. That
  * split is what a real user runs at 100 TB — the index is a nightly
  * batch job, the query is interactive — and it is the same lever as
  * [[graft.runtime.Bucketed]]: pay the expensive shuffle/training once
  * at layout-write time, then every query plans against the layout.
  *
  * [[ensure]] rebuilds at most once per JVM: a fresh process always
  * re-trains (the source data may have changed since another process
  * wrote the layout — correctness beats a stale-index read), and every
  * later call in the same process serves from the already-built index,
  * so a repeated benchmark measures the SERVING cost, not training.
  */
object AnnIndex {

  private val built = scala.collection.mutable.Set[String]()

  /** Index root under the session warehouse dir (the same place the
    * bucketed silver layout lives), keyed by the CANONICAL source path —
    * basename for readability plus an 8-hex md5 of the full canonical
    * path — so sf0.01 and sf0.1 never share an index AND two corpora
    * that merely share a basename (/a/sf0.1 vs /b/sf0.1) never collide.
    * Writers are single-process by harness contract (ensure() gates one
    * build per JVM); concurrent multi-JVM builds of the SAME corpus
    * would race the overwrite and need an external lock or a
    * write-then-rename layout. */
  def dir(spark: SparkSession, sfDir: String, kind: String): String = {
    val f = new java.io.File(sfDir)
    val canonical = try f.getCanonicalPath catch {
      case _: java.io.IOException => f.getAbsolutePath
    }
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    s"${spark.conf.get("spark.sql.warehouse.dir")}/graft_ann_index/" +
      s"${f.getName}-$md5/$kind"
  }

  /** Run `build` unless this JVM already built `path`. */
  def ensure(path: String)(build: => Unit): Unit = built.synchronized {
    if (!built.contains(path)) { build; built += path }
  }
}
