package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ±1 random projection (the Johnson–Lindenstrauss /
  * Achlioptas sign-matrix transform): project each quantized 64-dim
  * embedding to [[OutDim]] integer components p_i = Σ_j s_ij·q_j — the
  * cheap dimensionality-reduction stage that runs in front of ANN
  * indexing or clustering when the native dimension is too wide.
  *
  * The sign matrix is DERIVED, not stored: s_ij = +1 iff the first hex
  * digit of md5("rp_<i>_<j>") is even. md5 is bit-identical in every
  * engine, so the DuckDB oracle regenerates the identical matrix and
  * replays the integer dot products cell-for-cell — the hashSplit
  * determinism move applied to a weight matrix.
  *
  * Plan shape: the 16×64 matrix folds into the plan as LITERAL arrays
  * (driver-derived constant metadata — nothing joins, nothing
  * broadcasts), each component is one codegen'd zip_with/aggregate fold
  * over the scan, and the long-format unpivot is a narrow posexplode.
  * Zero shuffles at any corpus size. */
object RandomProjection {

  /** Output dimensionality. */
  val OutDim = 16

  /** s_ij ∈ {+1, −1} from the md5 parity rule. */
  private[graft] def sign(i: Int, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp_${i}_$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (Character.digit(hex.charAt(0), 16) % 2 == 0) 1L else -1L
  }

  /** Long-format projection: (vec_id, out_dim, p). */
  def project(s: SparkSession, dir: String,
              outDim: Int = OutDim): DataFrame = {
    val emb = Similarity.quantized(s, dir)
    val dim = 64
    val comps = (0 until outDim).map { i =>
      val arr = (0 until dim).map(j => s"${sign(i, j)}L")
        .mkString("array(", ", ", ")")
      expr(s"aggregate(zip_with(q, $arr, (a, b) -> a * b), 0L, " +
        "(acc, x) -> acc + x)")
    }
    emb
      .withColumn("proj", array(comps: _*))
      // posexplode_outer + null-pos filter: the InferFiltersFromGenerate
      // guard (proj is never empty; a null ELEMENT keeps plain
      // semantics)
      .select(col("vec_id"),
        posexplode_outer(col("proj")).as(Seq("out_dim", "p")))
      .filter(col("out_dim").isNotNull)
  }
}
