package graft.runtime

import graft.ops.{CdcJoinView, CdcView}
import graft.silver.MergeUpsert
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** A PERSISTED two-table JOIN view maintained from BOTH tables' change
  * logs — the operational loop over [[graft.ops.CdcJoinView]], closing
  * the gap [[MaterializedView]] leaves: that loop holds ONE log
  * position; a join view `V = SELECT dims, SUM(ms) FROM A ⋈ B GROUP BY
  * dims` must hold a position in EACH log and commit the PAIR
  * atomically with the data, or a crash leaves state that
  * double-applies one side's span. Reference analogue: the one
  * gold→gold dependency — the webtoon job reading the episode gold
  * (`gold_webtoon_daily_metrics.py:74-77`) is exactly a two-input
  * derived table a user would want maintained incrementally.
  *
  * Each [[refresh]] applies the signed decomposition
  * `Δ(A⋈B) = ΔA ⋈ B₁ ∪ A₀ ⋈ ΔB` ([[CdcJoinView.joinGroupDelta]] —
  * the telescoping identity and its exact-measure enforcement live
  * there), with `A₀` reconstructed by [[ChangeLog.snapshotAt]] at the
  * view's committed A-position and SEMI-RESTRICTED to ΔB's join keys
  * (exact: an A₀ row with no ΔB match contributes nothing to that
  * branch) — so the refresh bill is O(ΔA ⋈ B fan-out + ΔB-keyed slice
  * of A₀ + |view|), never a re-join of the tables. The base join runs
  * exactly once, at seed time.
  *
  * JOINT exactly-once without a transaction log: the two positions
  * ride the view rows as constant `_as_of_a` / `_as_of_b` columns
  * through [[MergeUpsert.replaceAll]]'s single-hive-partition staged
  * swap — the [[MaterializedView]] `_as_of` trick extended to a PAIR.
  * Because both positions live in the SAME files as the data, the one
  * directory rename commits (data, posA, posB) together: every crash
  * window leaves either the old triple (the span re-applies once,
  * correctly, from both old positions) or the new triple (it never
  * re-applies). There is no between-positions state to recover —
  * torn pairs are structurally unreachable, which is the whole design.
  * The recovery sweep heals a between-renames crash like every other
  * table here.
  *
  * Consumer registration, BOTH registries: every committed refresh
  * registers `jview-a-*` in A's [[Consumers]] and `jview-b-*` in B's,
  * each carrying the view directory — so neither log's
  * [[ChangeLog.checkpoint]] can fold entries the view still owes, and
  * a purge of EITHER log ([[Forget]]/[[Retention]] →
  * [[Consumers.invalidateAll]]) invalidates the view: its next refresh
  * discards state and re-seeds from the (already purged) bases. The
  * unregistered window between the data swap and the registers is
  * conservative: the registries then lag AT OR BELOW the committed
  * positions, so a concurrent fold stops early — never past what the
  * view still needs (a fold can also never pass a log's head, and the
  * just-committed positions ARE the heads).
  *
  * Ordering hazard, stated: `hb` (B's head) is read BEFORE B's table —
  * under the single-writer-per-table discipline every maintenance op
  * here assumes, no B batch lands between the two reads; a violated
  * discipline surfaces as a netted-out double-count on the next
  * refresh's span, which is why the discipline is a contract, not a
  * hope. A side with NO change log is legal and treated as static
  * (head −1, its branch of the decomposition empty); enabling CDC on
  * it later starts its history at that point. */
object JoinView {

  private val AsOfACol = "_as_of_a"
  private val AsOfBCol = "_as_of_b"

  /** Same non-underscore single-partition convention (and reason) as
    * [[MaterializedView.PartCol]]. */
  private val PartCol = "gv_pt"

  /** Registry names — one per log, both resolving to the same
    * viewDir so either side's compliance sweep reaches the state. */
  def consumerName(viewDir: String, side: String): String =
    s"jview-$side-" +
      MaterializedView.consumerName(viewDir).stripPrefix("mview-")

  /** The committed (posA, posB) pair, if the view holds state. Both
    * columns are constant across rows by the atomic-pair commit. */
  def positions(spark: SparkSession,
                viewDir: String): Option[(Long, Long)] = {
    val p = new Path(viewDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && MergeUpsert.sweepAndHasData(fs, p)) {
      val r = spark.read.parquet(viewDir)
        .agg(max(col(AsOfACol)), max(col(AsOfBCol))).head()
      Some((r.getLong(0), r.getLong(1)))
    } else None
  }

  /** An empty net-diff-schema frame for a side that did not move —
    * built from a DETACHED schema copy of the table (never from a
    * frame shared with the live join side: that would share attribute
    * ids and trip the ambiguous-self-join check). */
  private def emptyNet(spark: SparkSession, tableDir: String,
                       keys: Seq[String]): DataFrame = {
    val schema = spark.read.option("mergeSchema", "true")
      .parquet(tableDir).schema
    val vals = schema.fields.filterNot(f => keys.contains(f.name))
    val fields = keys.map(k => schema(k)) ++
      vals.flatMap(f => Seq(
        StructField(s"o_${f.name}", f.dataType),
        StructField(s"n_${f.name}", f.dataType))) :+
      StructField("diff_status", StringType)
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(fields.toArray))
  }

  /** Seed (first call) or incrementally refresh the join view at
    * `viewDir` over the logged tables at `aDir`/`bDir`. `aKeys`/`bKeys`
    * are each table's row key; `joinKeys` the equi-join columns (must
    * exist on both sides' images); `dims` name joined-frame columns;
    * `measures` are (name, expression-over-the-joined-columns) pairs —
    * exact arithmetic enforced. Returns the committed (posA, posB). */
  def refresh(spark: SparkSession, aDir: String, bDir: String,
              viewDir: String, aKeys: Seq[String], bKeys: Seq[String],
              joinKeys: Seq[String], dims: Seq[String],
              measures: Seq[(String, Column)]): (Long, Long) = {
    val names = measures.map(_._1)
    // Compliance invalidation from EITHER log's purge: discard and
    // re-seed from the (already purged) bases — a join view is row
    // images × join fan-out, the same must-not-serve-stale class as
    // the single-log views.
    if (MaterializedView.isInvalid(spark, viewDir)) {
      val p = new Path(viewDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
    val ha = Incremental.highWatermark(spark, ChangeLog.logDir(aDir))
      .getOrElse(-1L)
    val hb = Incremental.highWatermark(spark, ChangeLog.logDir(bDir))
      .getOrElse(-1L)
    def registered(pa: Long, pb: Long): (Long, Long) = {
      Consumers.register(spark, aDir, consumerName(viewDir, "a"), pa,
        viewDir = Some(viewDir))
      Consumers.register(spark, bDir, consumerName(viewDir, "b"), pb,
        viewDir = Some(viewDir))
      (pa, pb)
    }
    def persist(v: DataFrame, pa: Long, pb: Long): Unit =
      MergeUpsert.replaceAll(spark, viewDir,
        v.withColumn(AsOfACol, lit(pa)).withColumn(AsOfBCol, lit(pb))
          .withColumn(PartCol, lit("all")), partitionCol = PartCol)

    positions(spark, viewDir) match {
      case None =>
        val seed = seedAggregate(spark, aDir, bDir, joinKeys, dims,
          measures)
        persist(seed, ha, hb)
        registered(ha, hb)
      case Some((pa, pb)) if pa >= ha && pb >= hb =>
        registered(pa, pb) // nothing new on either side
      case Some((pa, pb)) =>
        val delta = spanDelta(spark, aDir, bDir, aKeys, bKeys, joinKeys,
          dims, measures, pa, pb, ha, hb)
        val view = spark.read.parquet(viewDir)
          .drop(AsOfACol, AsOfBCol, PartCol)
        persist(CdcView.applyDelta(view, delta, dims, names), ha, hb)
        registered(ha, hb)
    }
  }

  /** The one full A ⋈ B aggregate — seed time only. */
  private def seedAggregate(spark: SparkSession, aDir: String,
                            bDir: String, joinKeys: Seq[String],
                            dims: Seq[String],
                            measures: Seq[(String, Column)]): DataFrame = {
    val names = measures.map(_._1)
    val joined = spark.read.option("mergeSchema", "true").parquet(aDir)
      .join(spark.read.option("mergeSchema", "true").parquet(bDir),
        joinKeys)
    val seed = joined.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        measures.map { case (n, e) => sum(e).as(n) }: _*)
      .select(dims.map(col) ++ names.map(col) :+ col("n_rows"): _*)
    CdcView.requireExactMeasures(seed.schema, names)
    seed
  }

  /** The signed view delta from pair (pa, pb) to (ha, hb) — the
    * [[CdcJoinView.joinGroupDelta]] decomposition assembled from the
    * two logs' spans; telescopes to `A_ha⋈B_hb − A_pa⋈B_pb` for ANY
    * starting pair, which is what lets the partitioned form top up
    * straggler partitions from THEIR OWN pairs. readSince fails loud
    * when a position predates its log's collapse boundary (re-seed
    * the view) — unreachable while the view is registered, the point
    * of the dual registration. */
  private def spanDelta(spark: SparkSession, aDir: String, bDir: String,
                        aKeys: Seq[String], bKeys: Seq[String],
                        joinKeys: Seq[String], dims: Seq[String],
                        measures: Seq[(String, Column)],
                        pa: Long, pb: Long, ha: Long,
                        hb: Long): DataFrame = {
    val aNet =
      if (pa >= ha) emptyNet(spark, aDir, aKeys)
      else ChangeLog.netDiff(
        ChangeLog.readSince(spark, aDir, Some(pa)).get, aKeys)
    val bMoved = pb < hb
    val bNet =
      if (!bMoved) emptyNet(spark, bDir, bKeys)
      else ChangeLog.netDiff(
        ChangeLog.readSince(spark, bDir, Some(pb)).get, bKeys)
    val bCurrent = spark.read.option("mergeSchema", "true")
      .parquet(bDir)
    // A₀ — A as of the A-position — only when the B side moved (the
    // A₀ ⋈ ΔB branch is empty otherwise), and then semi-restricted to
    // ΔB's join keys: the snapshot reconstruction is
    // O(current + later entries), but the join probe is only the
    // ΔB-keyed slice.
    val aAtStart =
      if (!bMoved)
        spark.read.option("mergeSchema", "true").parquet(aDir)
          .limit(0)
      else ChangeLog.snapshotAt(spark, aDir, aKeys, pa)
        .join(CdcJoinView.deltaJoinKeys(bNet, bKeys, joinKeys),
          joinKeys, "left_semi")
    CdcJoinView.joinGroupDelta(aNet, aKeys, bNet, bKeys,
      bCurrent, aAtStart, joinKeys, dims, measures)
  }

  /** The partitioned form's PAIR-position file — one atomic file
    * holding both positions (`pa,pb`): two separate watermark files
    * could tear between writes, the exact state the pair design
    * exists to make unrepresentable. Sibling of the view (never
    * inside it — the seed's initial overwrite clears the root). */
  private def pairPosPath(viewDir: String): String =
    viewDir.stripSuffix("/") + "_pos"

  private def savePair(spark: SparkSession, path: String,
                       pa: Long, pb: Long): Unit = {
    val p = new Path(path)
    val tmp = new Path(path + ".tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(s"$pa,$pb".getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  private def loadPair(spark: SparkSession,
                       path: String): Option[(Long, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try {
      val bytes = new Array[Byte](128)
      val n = in.read(bytes)
      if (n <= 0) return None
      new String(bytes, 0, n, "UTF-8").trim
    } finally in.close()
    text.split(",") match {
      case Array(a, b) =>
        for (x <- a.toLongOption; y <- b.toLongOption) yield (x, y)
      case _ => None
    }
  }

  /** Large-view refresh — [[MaterializedView.refreshPartitioned]]'s
    * split commit extended to the POSITION PAIR. The view is
    * hive-partitioned on `partDim` (one of its dims — every group in
    * exactly one partition) and a refresh rewrites ONLY the
    * partitions the pair-span's delta touches: O(both spans + touched
    * partitions), where [[refresh]] pays O(|view|) per refresh.
    *
    * The commit splits into the same two honest pieces as the
    * single-log form, with the pair riding where the scalar rode:
    *
    *  - every row carries `_as_of_a`/`_as_of_b` — the pair ITS
    *    partition has applied (all partitions staged by one refresh
    *    stamp the same target pair; a crash mid-swap leaves a mix);
    *  - the PAIR-POSITION FILE (one atomic file, both positions,
    *    committed LAST) records the last fully-applied pair: every
    *    A-entry ≤ pa and B-entry ≤ pb is applied to every partition.
    *
    * Recovery is local arithmetic, never a re-seed, because
    * [[spanDelta]] telescopes from ANY starting pair: a straggler
    * partition at (a, b) is topped up by the delta from ITS pair —
    * it never double-applies; a partition already at (ha, hb) is
    * skipped. Crash windows mirror the single-log form: (seed
    * written, file not) → data with no file can only be a crashed
    * seed, recover the pair as (min `_as_of_a`, min `_as_of_b`);
    * (some partitions swapped, file not) → per-pair top-ups;
    * (all swapped, file not) → every top-up span is empty and the
    * file commits on the retry. The file never runs AHEAD of the
    * data, so both registered consumer positions stay conservative,
    * and a purge of EITHER log invalidates into a re-seed exactly as
    * in [[refresh]]. */
  def refreshPartitioned(spark: SparkSession, aDir: String, bDir: String,
                         viewDir: String, aKeys: Seq[String],
                         bKeys: Seq[String], joinKeys: Seq[String],
                         dims: Seq[String],
                         measures: Seq[(String, Column)],
                         partDim: String): (Long, Long) = {
    require(dims.contains(partDim),
      s"partDim '$partDim' must be one of the view dims " +
        s"${dims.mkString("[", ", ", "]")} — a group must live in " +
        "exactly one partition for partition-scoped rewrites to be " +
        "complete")
    val names = measures.map(_._1)
    val viewPath = new Path(viewDir)
    val fs = viewPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (MaterializedView.isInvalid(spark, viewDir)) {
      fs.delete(viewPath, true)
      fs.delete(new Path(pairPosPath(viewDir)), false)
    }
    val ha = Incremental.highWatermark(spark, ChangeLog.logDir(aDir))
      .getOrElse(-1L)
    val hb = Incremental.highWatermark(spark, ChangeLog.logDir(bDir))
      .getOrElse(-1L)
    def registered(pa: Long, pb: Long): (Long, Long) = {
      Consumers.register(spark, aDir, consumerName(viewDir, "a"), pa,
        viewDir = Some(viewDir))
      Consumers.register(spark, bDir, consumerName(viewDir, "b"), pb,
        viewDir = Some(viewDir))
      (pa, pb)
    }
    val hasState =
      fs.exists(viewPath) && MergeUpsert.sweepAndHasData(fs, viewPath)
    if (!hasState) {
      val seed = seedAggregate(spark, aDir, bDir, joinKeys, dims,
        measures)
      MergeUpsert.replaceAll(spark, viewDir,
        seed.withColumn(AsOfACol, lit(ha)).withColumn(AsOfBCol, lit(hb)),
        partitionCol = partDim)
      savePair(spark, pairPosPath(viewDir), ha, hb)
      return registered(ha, hb)
    }
    val (pa, pb) = loadPair(spark, pairPosPath(viewDir)).getOrElse {
      // Data without a pair file ⇔ a crashed seed (later refreshes
      // only ever advance an existing file): the seed stamped ONE
      // pair on every row — recover it.
      val r = spark.read.parquet(viewDir)
        .agg(min(col(AsOfACol)), min(col(AsOfBCol))).head()
      val rec = (r.getLong(0), r.getLong(1))
      savePair(spark, pairPosPath(viewDir), rec._1, rec._2)
      rec
    }
    if (pa >= ha && pb >= hb) return registered(pa, pb)
    val delta = spanDelta(spark, aDir, bDir, aKeys, bKeys, joinKeys,
      dims, measures, pa, pb, ha, hb).localCheckpoint()
    val touched = delta.select(col(partDim)).distinct()
      .collect().map(_.get(0)).toIndexedSeq
    if (touched.isEmpty) {
      savePair(spark, pairPosPath(viewDir), ha, hb)
      return registered(ha, hb)
    }
    val viewCur = spark.read.parquet(viewDir)
      .filter(col(partDim).isin(touched: _*))
    // Straggler detection: each partition's applied PAIR, clamped to
    // the committed pair component-wise (entries at or below the
    // committed pair reached every partition — the file invariant).
    val partPos: Map[Any, (Long, Long)] = viewCur
      .groupBy(col(partDim))
      .agg(max(col(AsOfACol)).as("a"), max(col(AsOfBCol)).as("b"))
      .collect()
      .map(r => r.get(0) ->
        (math.max(r.getLong(1), pa), math.max(r.getLong(2), pb))).toMap
    val groups = touched.groupBy(v => partPos.getOrElse(v, (pa, pb)))
    val staged = groups.toSeq.flatMap { case ((a, b), parts) =>
      if (a >= ha && b >= hb) None // at the head — skip, don't rewrite
      else {
        val deltaAB =
          if (a == pa && b == pb) delta.filter(col(partDim).isin(parts: _*))
          else spanDelta(spark, aDir, bDir, aKeys, bKeys, joinKeys,
            dims, measures, a, b, ha, hb)
            .filter(col(partDim).isin(parts: _*))
        val viewPart = viewCur.filter(col(partDim).isin(parts: _*))
          .drop(AsOfACol, AsOfBCol)
        Some((parts,
          CdcView.applyDelta(viewPart, deltaAB, dims, names)
            .withColumn(AsOfACol, lit(ha)).withColumn(AsOfBCol, lit(hb))))
      }
    }
    if (staged.nonEmpty) {
      val stage = staged.map(_._2).reduce(_.unionByName(_))
      MergeUpsert.replacePartitions(spark, viewDir, stage,
        staged.flatMap(_._1), partitionCol = partDim)
    }
    savePair(spark, pairPosPath(viewDir), ha, hb)
    registered(ha, hb)
  }
}
