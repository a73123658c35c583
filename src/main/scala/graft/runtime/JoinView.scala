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
  * table here. The sibling `_pos` pair file this form ALSO maintains
  * is not the commit — the data swap is — it is the REGISTRY
  * RESOLUTION TARGET the pointer registrations read (see below);
  * written after each swap and healed on the nothing-new path, it
  * only ever lags the data, which resolves conservatively.
  *
  * Consumer registration, BOTH registries, ATOMIC BY INDIRECTION:
  * the view registers `jview-a-*` in A's [[Consumers]] and
  * `jview-b-*` in B's as POINTER registrations
  * ([[Consumers.registerPointer]]) — each registry file holds only a
  * static pointer at the view's pair-position file and which
  * component is that log's position, so the two registries can NEVER
  * disagree: advancing the pair file advances both registrations in
  * ONE rename, and there is no per-refresh position write left to
  * crash between. The pointers are written BEFORE the seed (static
  * content — from then on only liveness stamps rewrite them), closing
  * the historical no-entry window; while the pair file is missing or
  * lagging the data (the only remaining windows: pre-first-commit, a
  * crash between the data swap and the pair-file write) both sides
  * resolve conservatively low, a fold stops early, and the next
  * refresh heals the file. Each registration carries the view
  * directory, so neither log's [[ChangeLog.checkpoint]] can fold
  * entries the view still owes, and a purge of EITHER log
  * ([[Forget]]/[[Retention]] → [[Consumers.invalidateAll]])
  * invalidates the view: its next refresh discards state and
  * re-seeds from the (already purged) bases.
  *
  * Ordering hazard, stated: `hb` (B's head) is read BEFORE B's table —
  * under the single-writer-per-table discipline every maintenance op
  * here assumes, no B batch lands between the two reads; a violated
  * discipline surfaces as a netted-out double-count on the next
  * refresh's span, which is why the discipline is a contract, not a
  * hope. A side with NO change log is legal and treated as static
  * (head −1, its branch of the decomposition empty, and its span-start
  * state IS its current state — the other side's branch reads it
  * directly, never through [[ChangeLog.snapshotAt]]); enabling CDC on
  * it later starts its history at that point.
  *
  * `joinType` extends the loop to LEFT OUTER views — the shape every
  * reference gold join takes (J1–J9) — via
  * [[CdcJoinView.leftJoinGroupDelta]]'s count-augmented delta:
  * unmatched-A groups enter the view null-extended and are retracted/
  * restored as B's key set churns. Measure NULLs read as 0 (contract
  * stated on the delta); mirror with `COALESCE(SUM(e), 0)`. */
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

  /** Per-side column restriction: when `cols` is set, the side
    * contributes only rowKey ∪ joinKeys ∪ cols to the joined frame —
    * every read (seed, current state, span-start snapshot, log
    * images) projects down before joining. This both honors the
    * non-key-collision contract mechanically (two sides sharing
    * generic column names — the reference golds all do — are pruned
    * apart instead of colliding) and keeps the IVM path's shuffles at
    * the referenced columns only. None = contribute everything. */
  private def projectPlain(df: DataFrame, keys: Seq[String],
                           joinKeys: Seq[String],
                           cols: Option[Seq[String]]): DataFrame =
    cols match {
      case None => df
      case Some(cs) =>
        val want = (keys ++ joinKeys ++ cs).distinct
        df.select(want.map(col): _*)
    }

  /** [[projectPlain]] over a net-diff frame: non-key contributions
    * ride as `o_`/`n_` image pairs. */
  private def projectNet(net: DataFrame, keys: Seq[String],
                         joinKeys: Seq[String],
                         cols: Option[Seq[String]]): DataFrame =
    cols match {
      case None => net
      case Some(cs) =>
        val vals = (joinKeys ++ cs).distinct.filterNot(keys.contains)
        val want = keys ++ vals.flatMap(c => Seq(s"o_$c", s"n_$c")) :+
          "diff_status"
        net.select(want.map(col): _*)
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

  /** The view's CONFIG SIGNATURE — a canonical rendering of every
    * knob that determines what the persisted state MEANS: join type,
    * physical layout (single-slot vs hive-partitioned and on which
    * dim), both row keys, the join keys, dims, measure
    * name:expression pairs, and the per-side column restrictions.
    * Committed as a `_cfg` sibling at seed time and compared on every
    * later refresh: maintained state is only valid under the EXACT
    * definition that seeded it (an inner-seeded view maintained with
    * left deltas, or a gv_pt=all layout discovered under a
    * datetime=X partition scheme, silently corrupts or fails
    * mid-read), so any mismatch — including a missing file, the
    * pre-cfg-revision upgrade case — drops the state and re-seeds
    * from the bases: one loud O(base join) bill instead of a silent
    * wrong answer or an opaque mixed-layout discovery error. */
  private def cfgText(layout: String, joinType: String,
                      aKeys: Seq[String], bKeys: Seq[String],
                      joinKeys: Seq[String], dims: Seq[String],
                      measures: Seq[(String, Column)],
                      aCols: Option[Seq[String]],
                      bCols: Option[Seq[String]]): String =
    Seq(
      s"layout=$layout",
      s"joinType=$joinType",
      s"aKeys=${aKeys.mkString(",")}",
      s"bKeys=${bKeys.mkString(",")}",
      s"joinKeys=${joinKeys.mkString(",")}",
      s"dims=${dims.mkString(",")}",
      s"measures=${measures
        .map { case (n, e) => s"$n:${e.toString}" }.mkString(";")}",
      s"aCols=${aCols.map(_.mkString(",")).getOrElse("*")}",
      s"bCols=${bCols.map(_.mkString(",")).getOrElse("*")}"
    ).mkString("\n")

  private def cfgPath(viewDir: String): String =
    viewDir.stripSuffix("/") + "_cfg"

  private def loadCfg(spark: SparkSession,
                      viewDir: String): Option[String] = {
    val p = new Path(cfgPath(viewDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](4096)
      var n = in.read(chunk)
      while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      Some(new String(buf.toByteArray, "UTF-8"))
    } finally in.close()
  }

  private def saveCfg(spark: SparkSession, viewDir: String,
                      text: String): Unit = {
    val p = new Path(cfgPath(viewDir))
    val tmp = new Path(cfgPath(viewDir) + ".tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  /** Drop state whose committed config does not match `cfg` (or that
    * predates config commits) so the caller's path re-seeds. Returns
    * true when a drop happened. No-op when no state exists. */
  private def dropIfCfgChanged(spark: SparkSession, viewDir: String,
                               cfg: String): Boolean = {
    val p = new Path(viewDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasState =
      fs.exists(p) && MergeUpsert.sweepAndHasData(fs, p)
    if (!hasState) return false
    val stored = loadCfg(spark, viewDir)
    if (stored.contains(cfg)) return false
    System.err.println(
      s"WARN [graft.JoinView] view $viewDir was seeded under a " +
        "different definition (" +
        stored.fold("no committed config — pre-config revision")(_ =>
          "config mismatch") +
        "); dropping its state to re-seed under the current one — " +
        "maintained state is only valid under the definition that " +
        "seeded it")
    fs.delete(p, true)
    fs.delete(new Path(pairPosPath(viewDir)), false)
    fs.delete(new Path(swapMarkerPath(viewDir)), false)
    fs.delete(new Path(cfgPath(viewDir)), false)
    true
  }

  /** Seed (first call) or incrementally refresh the join view at
    * `viewDir` over the logged tables at `aDir`/`bDir`. `aKeys`/`bKeys`
    * are each table's row key; `joinKeys` the equi-join columns (must
    * exist on both sides' images); `dims` name joined-frame columns;
    * `measures` are (name, expression-over-the-joined-columns) pairs —
    * exact arithmetic enforced. `joinType` is `"inner"` or `"left"`
    * (LEFT OUTER — A preserved, count-augmented maintenance);
    * `aCols`/`bCols` optionally restrict what each side contributes
    * (see [[projectPlain]]). Returns the committed (posA, posB). */
  def refresh(spark: SparkSession, aDir: String, bDir: String,
              viewDir: String, aKeys: Seq[String], bKeys: Seq[String],
              joinKeys: Seq[String], dims: Seq[String],
              measures: Seq[(String, Column)],
              joinType: String = "inner",
              aCols: Option[Seq[String]] = None,
              bCols: Option[Seq[String]] = None): (Long, Long) = {
    require(joinType == "inner" || joinType == "left",
      s"joinType '$joinType' — this loop maintains inner and left " +
        "outer equi-join views")
    val names = measures.map(_._1)
    // Compliance invalidation from EITHER log's purge: discard and
    // re-seed from the (already purged) bases — a join view is row
    // images × join fan-out, the same must-not-serve-stale class as
    // the single-log views.
    val fsV = new Path(viewDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (MaterializedView.isInvalid(spark, viewDir)) {
      fsV.delete(new Path(viewDir), true)
      fsV.delete(new Path(pairPosPath(viewDir)), false)
      fsV.delete(new Path(cfgPath(viewDir)), false)
    }
    val cfg = cfgText("single", joinType, aKeys, bKeys, joinKeys,
      dims, measures, aCols, bCols)
    dropIfCfgChanged(spark, viewDir, cfg)
    val ha = Incremental.highWatermark(spark, ChangeLog.logDir(aDir))
      .getOrElse(-1L)
    val hb = Incremental.highWatermark(spark, ChangeLog.logDir(bDir))
      .getOrElse(-1L)
    // Pointer registrations: static entries resolving positions from
    // the pair file — both registries advance in the pair's ONE
    // rename; these calls only (re)write the pointer + liveness stamp.
    def registered(pa: Long, pb: Long): (Long, Long) = {
      Consumers.registerPointer(spark, aDir, consumerName(viewDir, "a"),
        pairPosPath(viewDir), 0, viewDir = Some(viewDir))
      Consumers.registerPointer(spark, bDir, consumerName(viewDir, "b"),
        pairPosPath(viewDir), 1, viewDir = Some(viewDir))
      (pa, pb)
    }
    def persist(v: DataFrame, pa: Long, pb: Long): Unit =
      MergeUpsert.replaceAll(spark, viewDir,
        v.withColumn(AsOfACol, lit(pa)).withColumn(AsOfBCol, lit(pb))
          .withColumn(PartCol, lit("all")), partitionCol = PartCol)

    positions(spark, viewDir) match {
      case None =>
        // Pre-register BOTH pointers before any work: the entries are
        // static, so the historical no-registration window disappears
        // — a fold arriving mid-seed already sees both sides (at −1,
        // the missing-pair-file resolution: conservative).
        registered(-1L, -1L)
        val seed = seedAggregate(spark, aDir, bDir, aKeys, bKeys,
          joinKeys, dims, measures, joinType, aCols, bCols)
        persist(seed, ha, hb)
        savePair(spark, pairPosPath(viewDir), ha, hb)
        saveCfg(spark, viewDir, cfg)
        registered(ha, hb)
      case Some((pa, pb)) if pa >= ha && pb >= hb =>
        // Nothing new — but heal a pair file the last commit's crash
        // window left missing or lagging the data (the registrations
        // resolve from it; stale-low is conservative, not free).
        if (!loadPair(spark, pairPosPath(viewDir)).contains((pa, pb)))
          savePair(spark, pairPosPath(viewDir), pa, pb)
        registered(pa, pb)
      case Some((pa, pb)) =>
        val delta = spanDelta(spark, aDir, bDir, aKeys, bKeys, joinKeys,
          dims, measures, pa, pb, ha, hb, joinType, aCols, bCols)
        val view = spark.read.parquet(viewDir)
          .drop(AsOfACol, AsOfBCol, PartCol)
        persist(CdcView.applyDelta(view, delta, dims, names), ha, hb)
        savePair(spark, pairPosPath(viewDir), ha, hb)
        registered(ha, hb)
    }
  }

  /** The one full A ⋈ B (or A ⟕ B) aggregate — seed time only. The
    * left seed folds measure NULLs to 0 (`sum(coalesce(e, 0))`) so the
    * seed agrees cell-for-cell with the delta path's stated NULL-as-0
    * contract — an all-unmatched group must read 0 from either path. */
  private def seedAggregate(spark: SparkSession, aDir: String,
                            bDir: String, aKeys: Seq[String],
                            bKeys: Seq[String], joinKeys: Seq[String],
                            dims: Seq[String],
                            measures: Seq[(String, Column)],
                            joinType: String,
                            aCols: Option[Seq[String]],
                            bCols: Option[Seq[String]]): DataFrame = {
    val names = measures.map(_._1)
    val joined = projectPlain(
      spark.read.option("mergeSchema", "true").parquet(aDir),
      aKeys, joinKeys, aCols)
      .join(projectPlain(
        spark.read.option("mergeSchema", "true").parquet(bDir),
        bKeys, joinKeys, bCols),
        joinKeys, joinType)
    val seed = joined.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        measures.map { case (n, e) =>
          (if (joinType == "left") sum(coalesce(e, lit(0L)))
           else sum(e)).as(n)
        }: _*)
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
                        pa: Long, pb: Long, ha: Long, hb: Long,
                        joinType: String,
                        aCols: Option[Seq[String]],
                        bCols: Option[Seq[String]]): DataFrame = {
    val aNet = projectNet(
      if (pa >= ha) emptyNet(spark, aDir, aKeys)
      else ChangeLog.netDiff(
        ChangeLog.readSince(spark, aDir, Some(pa)).get, aKeys),
      aKeys, joinKeys, aCols)
    val bMoved = pb < hb
    val bNet = projectNet(
      if (!bMoved) emptyNet(spark, bDir, bKeys)
      else ChangeLog.netDiff(
        ChangeLog.readSince(spark, bDir, Some(pb)).get, bKeys),
      bKeys, joinKeys, bCols)
    val bCurrent = projectPlain(
      spark.read.option("mergeSchema", "true").parquet(bDir),
      bKeys, joinKeys, bCols)
    // A₀ — A as of the A-position — only when the B side moved (the
    // A₀ ⋈ ΔB branch is empty otherwise), and then semi-restricted to
    // ΔB's join keys: the snapshot reconstruction is
    // O(current + later entries), but the join probe is only the
    // ΔB-keyed slice. An UNLOGGED A never moves, so its span-start
    // state is its current state, read directly (snapshotAt needs a
    // log and fails loud without one).
    val aAtStart =
      if (!bMoved)
        projectPlain(
          spark.read.option("mergeSchema", "true").parquet(aDir),
          aKeys, joinKeys, aCols)
          .limit(0)
      else {
        val a0 =
          if (ChangeLog.readLog(spark, aDir).isEmpty)
            spark.read.option("mergeSchema", "true").parquet(aDir)
          else ChangeLog.snapshotAt(spark, aDir, aKeys, pa)
        projectPlain(a0, aKeys, joinKeys, aCols)
          .join(CdcJoinView.deltaJoinKeys(bNet, bKeys, joinKeys),
            joinKeys, "left_semi")
      }
    if (joinType == "left")
      CdcJoinView.leftJoinGroupDelta(aNet, aKeys, bNet, bKeys,
        bCurrent, aAtStart, joinKeys, dims, measures)
    else
      CdcJoinView.joinGroupDelta(aNet, aKeys, bNet, bKeys,
        bCurrent, aAtStart, joinKeys, dims, measures)
  }

  /** The PAIR-position file — one atomic file holding both positions
    * (`pa,pb`): two separate watermark files could tear between
    * writes, the exact state the pair design exists to make
    * unrepresentable. For [[refreshPartitioned]] it is the commit
    * record; for [[refresh]] a registry-resolution mirror of the
    * data-committed pair. Both forms' pointer registrations resolve
    * from it, so advancing it advances both registries at once.
    * Sibling of the view (never inside it — the seed's initial
    * overwrite clears the root). */
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
                         partDim: String,
                         joinType: String = "inner",
                         aCols: Option[Seq[String]] = None,
                         bCols: Option[Seq[String]] = None): (Long, Long) = {
    require(joinType == "inner" || joinType == "left",
      s"joinType '$joinType' — this loop maintains inner and left " +
        "outer equi-join views")
    require(dims.contains(partDim),
      s"partDim '$partDim' must be one of the view dims " +
        s"${dims.mkString("[", ", ", "]")} — a group must live in " +
        "exactly one partition for partition-scoped rewrites to be " +
        "complete. Its values must be NON-NULL (a null hive partition " +
        "defeats value-scoped rewrites); for a LEFT view pick an " +
        "A-side dim — B-side dims are null for unmatched groups")
    val names = measures.map(_._1)
    val viewPath = new Path(viewDir)
    val fs = viewPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (MaterializedView.isInvalid(spark, viewDir)) {
      fs.delete(viewPath, true)
      fs.delete(new Path(pairPosPath(viewDir)), false)
      fs.delete(new Path(swapMarkerPath(viewDir)), false)
      fs.delete(new Path(cfgPath(viewDir)), false)
    }
    val cfg = cfgText(s"part:$partDim", joinType, aKeys, bKeys,
      joinKeys, dims, measures, aCols, bCols)
    dropIfCfgChanged(spark, viewDir, cfg)
    val ha = Incremental.highWatermark(spark, ChangeLog.logDir(aDir))
      .getOrElse(-1L)
    val hb = Incremental.highWatermark(spark, ChangeLog.logDir(bDir))
      .getOrElse(-1L)
    def registered(pa: Long, pb: Long): (Long, Long) = {
      Consumers.registerPointer(spark, aDir, consumerName(viewDir, "a"),
        pairPosPath(viewDir), 0, viewDir = Some(viewDir))
      Consumers.registerPointer(spark, bDir, consumerName(viewDir, "b"),
        pairPosPath(viewDir), 1, viewDir = Some(viewDir))
      (pa, pb)
    }
    val hasState =
      fs.exists(viewPath) && MergeUpsert.sweepAndHasData(fs, viewPath)
    if (!hasState) {
      // Pre-register the static pointers before any work (see
      // [[refresh]]) — a fold arriving mid-seed already sees both
      // sides, resolved conservatively at −1 until the pair commits.
      registered(-1L, -1L)
      val seed = seedAggregate(spark, aDir, bDir, aKeys, bKeys,
        joinKeys, dims, measures, joinType, aCols, bCols)
      MergeUpsert.replaceAll(spark, viewDir,
        seed.withColumn(AsOfACol, lit(ha)).withColumn(AsOfBCol, lit(hb)),
        partitionCol = partDim)
      savePair(spark, pairPosPath(viewDir), ha, hb)
      saveCfg(spark, viewDir, cfg)
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
    if (pa >= ha && pb >= hb) {
      // A marker here is a LEFTOVER: the pair file only advances after
      // its refresh's swaps, so stamps never exceed a committed
      // at-the-head pair — the ahead-scan would find nothing. Clear it
      // now, or every later data-bearing refresh pays the full-view
      // repair scan until one happens to complete the full path.
      val m = new Path(swapMarkerPath(viewDir))
      if (fs.exists(m)) fs.delete(m, false)
      return registered(pa, pb)
    }
    val delta = spanDelta(spark, aDir, bDir, aKeys, bKeys, joinKeys,
      dims, measures, pa, pb, ha, hb, joinType, aCols, bCols)
      .localCheckpoint()
    val deltaTouched = delta.select(col(partDim)).distinct()
      .collect().map(_.get(0)).toIndexedSeq
    // Crash-window completion: a partition swapped by a CRASHED
    // refresh is stamped AHEAD of the committed pair — and if its
    // applied sub-span happens to NET AWAY over the full committed
    // span (a key added in the crashed span, removed after), the
    // delta names no row for it, yet it still owes the complement
    // span. The swap-intent marker (created before any partition
    // swap, deleted after the pair file commits) gates the repair
    // scan, so the steady state pays one fs.exists; when set, scan
    // for stamps exceeding the committed pair (column-pruned: the
    // hive partition column plus two constant-per-file stamps) and
    // top those partitions up from their OWN pairs like any other
    // straggler.
    val marker = new Path(swapMarkerPath(viewDir))
    val ahead: IndexedSeq[Any] =
      if (!fs.exists(marker)) IndexedSeq.empty
      else spark.read.parquet(viewDir)
        .groupBy(col(partDim))
        .agg(max(col(AsOfACol)).as("_a"), max(col(AsOfBCol)).as("_b"))
        .filter(col("_a") > pa || col("_b") > pb)
        .select(col(partDim)).collect().map(_.get(0)).toIndexedSeq
    val touched = (deltaTouched ++ ahead).distinct
    if (touched.isEmpty) {
      savePair(spark, pairPosPath(viewDir), ha, hb)
      fs.delete(marker, false)
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
            dims, measures, a, b, ha, hb, joinType, aCols, bCols)
            .filter(col(partDim).isin(parts: _*))
        val viewPart = viewCur.filter(col(partDim).isin(parts: _*))
          .drop(AsOfACol, AsOfBCol)
        Some((parts,
          CdcView.applyDelta(viewPart, deltaAB, dims, names)
            .withColumn(AsOfACol, lit(ha)).withColumn(AsOfBCol, lit(hb))))
      }
    }
    if (staged.nonEmpty) {
      // Swap-intent marker BEFORE the first partition rename; deleted
      // only after the pair file commits — so a crash anywhere in the
      // swap leaves the marker, and the next refresh runs the
      // ahead-stamp repair scan above.
      fs.create(marker, true).close()
      val stage = staged.map(_._2).reduce(_.unionByName(_))
      MergeUpsert.replacePartitions(spark, viewDir, stage,
        staged.flatMap(_._1), partitionCol = partDim)
    }
    savePair(spark, pairPosPath(viewDir), ha, hb)
    fs.delete(marker, false)
    registered(ha, hb)
  }

  /** Swap-intent marker (sibling, like the pair file — never inside
    * the view: the seed's overwrite would wipe it). Present ⇔ a
    * partition swap may have started without its pair-file commit. */
  private def swapMarkerPath(viewDir: String): String =
    viewDir.stripSuffix("/") + "_swapping"
}
