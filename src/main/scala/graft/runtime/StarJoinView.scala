package graft.runtime

import graft.ops.{CdcStarView, CdcView}
import graft.silver.MergeUpsert
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED star join view maintained from the FACT's and EVERY
  * dimension's change log — [[JoinView]] generalized from one logged
  * dimension to K ([[graft.ops.CdcStarView]] carries the
  * decomposition and its telescoping proof). The position VECTOR
  * (fact + one per dim) rides the view rows as constant
  * `_as_of_f` / `_as_of_d0` / … / `_as_of_d<k-1>` columns through the
  * single-hive-partition staged swap, so data and ALL K+1 positions
  * commit in ONE rename — a torn vector is structurally unreachable,
  * the same argument as [[JoinView]]'s pair, and the reason this loop
  * needs no position file at all.
  *
  * Every log gets a registered consumer (`sjview-f-*` /
  * `sjview-d<i>-*`, each carrying the view dir), so no log's
  * [[ChangeLog.checkpoint]] can fold entries the view still owes and
  * a purge of ANY of the K+1 logs invalidates the view into a
  * re-seed. A side with no change log is legal-static (head −1, no
  * term) — enable CDC on it later and its history starts there. */
object StarJoinView {

  /** One dimension of the star: its table directory, row key, and the
    * fact-side equi-join columns (present on fact and dim images). */
  final case class DimSpec(dir: String, keys: Seq[String],
                           joinKeys: Seq[String])

  private val AsOfFCol = "_as_of_f"
  private def asOfDCol(i: Int) = s"_as_of_d$i"
  private val PartCol = "gv_pt" // same convention as MaterializedView

  def consumerName(viewDir: String, side: String): String =
    s"sjview-$side-" +
      MaterializedView.consumerName(viewDir).stripPrefix("mview-")

  /** The committed position vector (fact +: dims), if state exists. */
  def positions(spark: SparkSession, viewDir: String,
                nDims: Int): Option[Seq[Long]] = {
    val p = new Path(viewDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && MergeUpsert.sweepAndHasData(fs, p)) {
      val cols = AsOfFCol +: (0 until nDims).map(asOfDCol)
      val r = spark.read.parquet(viewDir)
        .agg(max(col(cols.head)), cols.tail.map(c => max(col(c))): _*)
        .head()
      Some(cols.indices.map(r.getLong))
    } else None
  }

  /** Seed or incrementally refresh the star view. Returns the
    * committed position vector (fact +: dims). */
  def refresh(spark: SparkSession, factDir: String, dims: Seq[DimSpec],
              viewDir: String, fKeys: Seq[String],
              viewDims: Seq[String],
              measures: Seq[(String, Column)]): Seq[Long] = {
    require(dims.nonEmpty, "a star needs at least one dimension — " +
      "use MaterializedView for a single-table view")
    val names = measures.map(_._1)
    if (MaterializedView.isInvalid(spark, viewDir)) {
      val p = new Path(viewDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
    def head(dir: String): Long =
      Incremental.highWatermark(spark, ChangeLog.logDir(dir))
        .getOrElse(-1L)
    val heads = head(factDir) +: dims.map(d => head(d.dir))
    def registered(pos: Seq[Long]): Seq[Long] = {
      Consumers.register(spark, factDir, consumerName(viewDir, "f"),
        pos.head, viewDir = Some(viewDir))
      dims.zipWithIndex.foreach { case (d, i) =>
        Consumers.register(spark, d.dir, consumerName(viewDir, s"d$i"),
          pos(i + 1), viewDir = Some(viewDir))
      }
      pos
    }
    def persist(v: DataFrame, pos: Seq[Long]): Unit = {
      val stamped = dims.indices.foldLeft(
        v.withColumn(AsOfFCol, lit(pos.head))) { (acc, i) =>
        acc.withColumn(asOfDCol(i), lit(pos(i + 1)))
      }
      MergeUpsert.replaceAll(spark, viewDir,
        stamped.withColumn(PartCol, lit("all")), partitionCol = PartCol)
    }
    def read(dir: String): DataFrame =
      spark.read.option("mergeSchema", "true").parquet(dir)

    positions(spark, viewDir, dims.size) match {
      case None =>
        // Seed: the one full star join, stamped at every head.
        val joined = dims.foldLeft(read(factDir)) {
          (acc, d) => acc.join(read(d.dir), d.joinKeys)
        }
        val seed = joined.groupBy(viewDims.map(col): _*)
          .agg(count(lit(1)).as("n_rows"),
            measures.map { case (n, e) => sum(e).as(n) }: _*)
          .select(viewDims.map(col) ++ names.map(col) :+
            col("n_rows"): _*)
        CdcView.requireExactMeasures(seed.schema, names)
        persist(seed, heads)
        registered(heads)
      case Some(pos) if pos.indices.forall(i => pos(i) >= heads(i)) =>
        registered(pos) // nothing new on any side
      case Some(pos) =>
        val fNet =
          if (pos.head >= heads.head) None
          else Some(ChangeLog.netDiff(
            ChangeLog.readSince(spark, factDir, Some(pos.head)).get,
            fKeys))
        val sides = dims.zipWithIndex.map { case (d, i) =>
          val p = pos(i + 1)
          CdcStarView.Side(d.keys, d.joinKeys, read(d.dir),
            net =
              if (p >= heads(i + 1)) None
              else Some(ChangeLog.netDiff(
                ChangeLog.readSince(spark, d.dir, Some(p)).get, d.keys)),
            atStart = () =>
              ChangeLog.snapshotAt(spark, d.dir, d.keys, p))
        }
        val delta = CdcStarView.starGroupDelta(fNet, fKeys,
          fAtStart = () =>
            ChangeLog.snapshotAt(spark, factDir, fKeys, pos.head),
          sides, viewDims, measures)
        val dropCols = (AsOfFCol +: dims.indices.map(asOfDCol)) :+
          PartCol
        val view = spark.read.parquet(viewDir).drop(dropCols: _*)
        persist(CdcView.applyDelta(view, delta, viewDims, names), heads)
        registered(heads)
    }
  }
}
