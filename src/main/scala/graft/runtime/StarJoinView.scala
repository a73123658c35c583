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
  * the same argument as [[JoinView]]'s pair. The sibling vector file
  * the single-slot form also writes is not the commit — the data
  * swap is — it is the resolution target the pointer registrations
  * read; it only ever lags the data, which resolves conservatively.
  *
  * Every log gets a registered consumer (`sjview-f-*` /
  * `sjview-d<i>-*`, each carrying the view dir), so no log's
  * [[ChangeLog.checkpoint]] can fold entries the view still owes and
  * a purge of ANY of the K+1 logs invalidates the view into a
  * re-seed. The K+1 registrations are POINTERS
  * ([[Consumers.registerPointer]]) at the view's vector-position
  * file, one component each — static entries written before the
  * seed, so the registries can never disagree: advancing the vector
  * file advances all K+1 registrations in ONE rename, and a missing
  * or lagging file resolves conservatively at −1 until the next
  * refresh heals it. (The single-slot form commits positions through
  * the data swap and mirrors them into the vector file for exactly
  * this resolution.) A side with no change log is legal-static (head −1, no
  * term of its own, and its span-start state in OTHER sides' terms is
  * its current state, read directly — never via snapshotAt, which
  * needs a log) — enable CDC on it later and its history starts
  * there. */
object StarJoinView {

  /** One dimension of the star: its table directory, row key, and the
    * fact-side equi-join columns (present on fact and dim images).
    * `cols`, when set, restricts what the side CONTRIBUTES to the
    * joined frame beyond keys/joinKeys — every read of the side
    * (seed, current, span-start, log images) projects down first,
    * honoring the non-key-collision contract mechanically and pruning
    * the IVM path's shuffles to the referenced columns (the
    * [[JoinView]] aCols/bCols convention). None = everything. */
  final case class DimSpec(dir: String, keys: Seq[String],
                           joinKeys: Seq[String],
                           cols: Option[Seq[String]] = None)

  /** Column restriction for a plain side frame. */
  private def projectPlain(df: DataFrame, keys: Seq[String],
                           joinKeys: Seq[String],
                           cols: Option[Seq[String]]): DataFrame =
    cols match {
      case None => df
      case Some(cs) =>
        val want = (keys ++ joinKeys ++ cs).distinct
        df.select(want.map(col): _*)
    }

  /** [[projectPlain]] over a net-diff frame (`o_`/`n_` image pairs). */
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

  /** Star-shape guard: every dim must equi-join the FACT on FACT
    * columns. The ordered decomposition ([[CdcStarView]]) relies on
    * each dim's term probing the fact side directly; a dim whose
    * joinKeys live on ANOTHER dim (a snowflake dim-on-dim chain)
    * silently doesn't fit it — the chained join would resolve the key
    * only after the earlier dim attached, and the per-dim span terms
    * would probe the wrong side. Fail loud with the workaround
    * instead of an opaque unresolved-column error mid-join. */
  private def requireStarShape(spark: SparkSession, factDir: String,
                               dims: Seq[DimSpec]): Unit = {
    val factCols = spark.read.option("mergeSchema", "true")
      .parquet(factDir).schema.fieldNames.toSet
    dims.zipWithIndex.foreach { case (d, i) =>
      val missing = d.joinKeys.filterNot(factCols.contains)
      require(missing.isEmpty,
        s"dim #$i (${d.dir}) joins on " +
          s"${missing.mkString("[", ", ", "]")}, which are not FACT " +
          "columns: this loop maintains a STAR (every dim equi-joins " +
          "the fact directly), not a snowflake dim-on-dim chain. " +
          "Pre-join the snowflake arm into ONE dim table (and log " +
          "that table) so it joins the fact on fact columns, or " +
          "restructure the view")
    }
  }

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

  /** Seed or incrementally refresh the star view. `joinType` is
    * `"inner"` or `"left"` (the CHAINED LEFT OUTER star — the
    * reference's actual gold shape; maintained by
    * [[graft.ops.CdcStarView.leftStarGroupDelta]]'s per-dim
    * count-augmented delta; measure NULLs read 0, mirror with
    * `COALESCE(SUM(e), 0)`). Returns the committed position vector
    * (fact +: dims). */
  def refresh(spark: SparkSession, factDir: String, dims: Seq[DimSpec],
              viewDir: String, fKeys: Seq[String],
              viewDims: Seq[String],
              measures: Seq[(String, Column)],
              joinType: String = "inner",
              fCols: Option[Seq[String]] = None): Seq[Long] = {
    require(dims.nonEmpty, "a star needs at least one dimension — " +
      "use MaterializedView for a single-table view")
    require(joinType == "inner" || joinType == "left",
      s"joinType '$joinType' — this loop maintains inner and chained " +
        "left outer star views")
    requireStarShape(spark, factDir, dims)
    val allJoinKeys = dims.flatMap(_.joinKeys).distinct
    val names = measures.map(_._1)
    val fsV = new Path(viewDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (MaterializedView.isInvalid(spark, viewDir)) {
      fsV.delete(new Path(viewDir), true)
      fsV.delete(new Path(vecPosPath(viewDir)), false)
    }
    def head(dir: String): Long =
      Incremental.highWatermark(spark, ChangeLog.logDir(dir))
        .getOrElse(-1L)
    val heads = head(factDir) +: dims.map(d => head(d.dir))
    // Pointer registrations: static entries resolving positions from
    // the vector file — all K+1 registries advance in its ONE rename;
    // these calls only (re)write the pointer + liveness stamp.
    def registered(pos: Seq[Long]): Seq[Long] = {
      Consumers.registerPointer(spark, factDir,
        consumerName(viewDir, "f"), vecPosPath(viewDir), 0,
        viewDir = Some(viewDir))
      dims.zipWithIndex.foreach { case (d, i) =>
        Consumers.registerPointer(spark, d.dir,
          consumerName(viewDir, s"d$i"), vecPosPath(viewDir), i + 1,
          viewDir = Some(viewDir))
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
        // Pre-register every pointer before any work — a fold
        // arriving mid-seed already sees all K+1 sides, resolved
        // conservatively at −1 until the vector file commits.
        registered(heads)
        // Seed: the one full star join, stamped at every head. The
        // left seed folds measure NULLs to 0 (sum(coalesce)) so it
        // agrees cell-for-cell with the delta path's contract.
        val joined = dims.foldLeft(
          projectPlain(read(factDir), fKeys, allJoinKeys, fCols)) {
          (acc, d) => acc.join(
            projectPlain(read(d.dir), d.keys, d.joinKeys, d.cols),
            d.joinKeys, joinType)
        }
        val seed = joined.groupBy(viewDims.map(col): _*)
          .agg(count(lit(1)).as("n_rows"),
            measures.map { case (n, e) =>
              (if (joinType == "left") sum(coalesce(e, lit(0L)))
               else sum(e)).as(n)
            }: _*)
          .select(viewDims.map(col) ++ names.map(col) :+
            col("n_rows"): _*)
        CdcView.requireExactMeasures(seed.schema, names)
        persist(seed, heads)
        saveVec(spark, vecPosPath(viewDir), heads)
        registered(heads)
      case Some(pos) if pos.indices.forall(i => pos(i) >= heads(i)) =>
        // Nothing new — heal a vector file the last commit's crash
        // window left missing or lagging the data-committed vector.
        if (!loadVec(spark, vecPosPath(viewDir), pos.size).contains(pos))
          saveVec(spark, vecPosPath(viewDir), pos)
        registered(pos)
      case Some(pos) =>
        val delta = vectorDelta(spark, factDir, dims, fKeys, viewDims,
          measures, pos, heads, joinType, fCols)
        val dropCols = (AsOfFCol +: dims.indices.map(asOfDCol)) :+
          PartCol
        val view = spark.read.parquet(viewDir).drop(dropCols: _*)
        persist(CdcView.applyDelta(view, delta, viewDims, names), heads)
        saveVec(spark, vecPosPath(viewDir), heads)
        registered(heads)
    }
  }

  /** The signed view delta from position vector `pos` to `heads` —
    * the star decomposition assembled from every log's span. Like
    * [[JoinView]]'s spanDelta it telescopes from ANY starting vector
    * (each term's identity holds per side independently), which is
    * what lets [[refreshPartitioned]] top up straggler partitions
    * from their OWN vectors. */
  private def vectorDelta(spark: SparkSession, factDir: String,
                          dims: Seq[DimSpec], fKeys: Seq[String],
                          viewDims: Seq[String],
                          measures: Seq[(String, Column)],
                          pos: Seq[Long], heads: Seq[Long],
                          joinType: String = "inner",
                          fCols: Option[Seq[String]] = None): DataFrame = {
    val allJoinKeys = dims.flatMap(_.joinKeys).distinct
    def read(dir: String): DataFrame =
      spark.read.option("mergeSchema", "true").parquet(dir)
    // An UNLOGGED side never moves: its span-start state IS its
    // current state, read directly — snapshotAt needs a log and
    // fails loud without one (the thunks are lazy, so a side whose
    // start state no term needs never pays the check either).
    def startState(dir: String, keys: Seq[String], p: Long): DataFrame =
      if (ChangeLog.readLog(spark, dir).isEmpty) read(dir)
      else ChangeLog.snapshotAt(spark, dir, keys, p)
    val fNet =
      if (pos.head >= heads.head) None
      else Some(projectNet(ChangeLog.netDiff(
        ChangeLog.readSince(spark, factDir, Some(pos.head)).get,
        fKeys), fKeys, allJoinKeys, fCols))
    val sides = dims.zipWithIndex.map { case (d, i) =>
      val p = pos(i + 1)
      CdcStarView.Side(d.keys, d.joinKeys,
        projectPlain(read(d.dir), d.keys, d.joinKeys, d.cols),
        net =
          if (p >= heads(i + 1)) None
          else Some(projectNet(ChangeLog.netDiff(
            ChangeLog.readSince(spark, d.dir, Some(p)).get, d.keys),
            d.keys, d.joinKeys, d.cols)),
        atStart = () => projectPlain(
          startState(d.dir, d.keys, p), d.keys, d.joinKeys, d.cols))
    }
    def fStart(): DataFrame = projectPlain(
      startState(factDir, fKeys, pos.head), fKeys, allJoinKeys, fCols)
    if (joinType == "left")
      CdcStarView.leftStarGroupDelta(fNet, fKeys,
        fAtStart = fStart _, sides, viewDims, measures)
    else
      CdcStarView.starGroupDelta(fNet, fKeys,
        fAtStart = fStart _, sides, viewDims, measures)
  }

  /** The partitioned form's VECTOR-position file — one atomic file
    * holding every position (`p0,p1,…,pk`), same tear argument as
    * [[JoinView]]'s pair file. Sibling of the view. */
  private def vecPosPath(viewDir: String): String =
    viewDir.stripSuffix("/") + "_pos"

  private def saveVec(spark: SparkSession, path: String,
                      pos: Seq[Long]): Unit = {
    val p = new Path(path)
    val tmp = new Path(path + ".tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(pos.mkString(",").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  private def loadVec(spark: SparkSession, path: String,
                      n: Int): Option[Seq[Long]] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try {
      val bytes = new Array[Byte](512)
      val read = in.read(bytes)
      if (read <= 0) return None
      new String(bytes, 0, read, "UTF-8").trim
    } finally in.close()
    val parts = text.split(",").toSeq
    if (parts.size != n) None
    else {
      val longs = parts.flatMap(_.toLongOption)
      if (longs.size == n) Some(longs) else None
    }
  }

  /** Large-star-view refresh — [[JoinView.refreshPartitioned]]'s
    * split commit with the position VECTOR where the pair rode: the
    * view is hive-partitioned on `partDim` (one of its dims), every
    * row carries the vector ITS partition has applied, and one atomic
    * vector-position file commits LAST. Recovery is per-partition
    * local arithmetic from each straggler's OWN vector
    * ([[vectorDelta]] telescopes from any start); crash windows are
    * the same three as the pair form — crashed seed (recover the
    * vector as the per-column minima), mixed stragglers (per-vector
    * top-ups), all-swapped-file-not (every top-up span empty, the
    * file recommits). */
  def refreshPartitioned(spark: SparkSession, factDir: String,
                         dims: Seq[DimSpec], viewDir: String,
                         fKeys: Seq[String], viewDims: Seq[String],
                         measures: Seq[(String, Column)],
                         partDim: String,
                         joinType: String = "inner",
                         fCols: Option[Seq[String]] = None): Seq[Long] = {
    require(dims.nonEmpty, "a star needs at least one dimension")
    val allJoinKeys = dims.flatMap(_.joinKeys).distinct
    require(joinType == "inner" || joinType == "left",
      s"joinType '$joinType' — this loop maintains inner and chained " +
        "left outer star views")
    requireStarShape(spark, factDir, dims)
    require(viewDims.contains(partDim),
      s"partDim '$partDim' must be one of the view dims " +
        s"${viewDims.mkString("[", ", ", "]")} — a group must live " +
        "in exactly one partition. Its values must be NON-NULL (a " +
        "null hive partition defeats value-scoped rewrites); for a " +
        "LEFT star pick a fact-side dim — dim-side dims are null for " +
        "unmatched groups")
    val names = measures.map(_._1)
    val asOfCols = AsOfFCol +: dims.indices.map(asOfDCol)
    val viewPath = new Path(viewDir)
    val fs = viewPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (MaterializedView.isInvalid(spark, viewDir)) {
      fs.delete(viewPath, true)
      fs.delete(new Path(vecPosPath(viewDir)), false)
      fs.delete(new Path(swapMarkerPath(viewDir)), false)
    }
    def head(dir: String): Long =
      Incremental.highWatermark(spark, ChangeLog.logDir(dir))
        .getOrElse(-1L)
    val heads = head(factDir) +: dims.map(d => head(d.dir))
    def registered(pos: Seq[Long]): Seq[Long] = {
      Consumers.registerPointer(spark, factDir,
        consumerName(viewDir, "f"), vecPosPath(viewDir), 0,
        viewDir = Some(viewDir))
      dims.zipWithIndex.foreach { case (d, i) =>
        Consumers.registerPointer(spark, d.dir,
          consumerName(viewDir, s"d$i"), vecPosPath(viewDir), i + 1,
          viewDir = Some(viewDir))
      }
      pos
    }
    def stamp(v: DataFrame, pos: Seq[Long]): DataFrame =
      asOfCols.zip(pos).foldLeft(v) { case (acc, (c, p)) =>
        acc.withColumn(c, lit(p))
      }
    def read(dir: String): DataFrame =
      spark.read.option("mergeSchema", "true").parquet(dir)
    val hasState =
      fs.exists(viewPath) && MergeUpsert.sweepAndHasData(fs, viewPath)
    if (!hasState) {
      // Pre-register every pointer before any work (see [[refresh]]).
      registered(heads)
      val joined = dims.foldLeft(
        projectPlain(read(factDir), fKeys, allJoinKeys, fCols)) {
        (acc, d) => acc.join(
          projectPlain(read(d.dir), d.keys, d.joinKeys, d.cols),
          d.joinKeys, joinType)
      }
      val seed = joined.groupBy(viewDims.map(col): _*)
        .agg(count(lit(1)).as("n_rows"),
          measures.map { case (n, e) =>
            (if (joinType == "left") sum(coalesce(e, lit(0L)))
             else sum(e)).as(n)
          }: _*)
        .select(viewDims.map(col) ++ names.map(col) :+
          col("n_rows"): _*)
      CdcView.requireExactMeasures(seed.schema, names)
      MergeUpsert.replaceAll(spark, viewDir, stamp(seed, heads),
        partitionCol = partDim)
      saveVec(spark, vecPosPath(viewDir), heads)
      return registered(heads)
    }
    val pos = loadVec(spark, vecPosPath(viewDir), heads.size)
      .getOrElse {
        // Data without a vector file ⇔ a crashed seed: one vector on
        // every row — recover it as the per-column minima.
        val r = spark.read.parquet(viewDir)
          .agg(min(col(asOfCols.head)),
            asOfCols.tail.map(c => min(col(c))): _*).head()
        val rec = asOfCols.indices.map(r.getLong)
        saveVec(spark, vecPosPath(viewDir), rec)
        rec
      }
    if (pos.indices.forall(i => pos(i) >= heads(i))) {
      // A marker here is a leftover (stamps never exceed a committed
      // at-the-head vector — the ahead-scan would find nothing); clear
      // it so later data-bearing refreshes skip the repair scan.
      val m = new Path(swapMarkerPath(viewDir))
      if (fs.exists(m)) fs.delete(m, false)
      return registered(pos)
    }
    val delta = vectorDelta(spark, factDir, dims, fKeys, viewDims,
      measures, pos, heads, joinType, fCols).localCheckpoint()
    val deltaTouched = delta.select(col(partDim)).distinct()
      .collect().map(_.get(0)).toIndexedSeq
    // Crash-window completion — the [[JoinView.refreshPartitioned]]
    // argument with the VECTOR where the pair rode: a partition
    // swapped by a crashed refresh is stamped ahead of the committed
    // vector, and a netted-away full-span delta would never name it.
    // The swap-intent marker gates the repair scan (steady state pays
    // one fs.exists); when set, partitions with any stamp component
    // exceeding the committed vector join the straggler top-ups.
    val marker = new Path(swapMarkerPath(viewDir))
    val ahead: IndexedSeq[Any] =
      if (!fs.exists(marker)) IndexedSeq.empty
      else spark.read.parquet(viewDir)
        .groupBy(col(partDim))
        .agg(max(col(asOfCols.head)).as("_p0"),
          asOfCols.tail.zipWithIndex.map { case (c, i) =>
            max(col(c)).as(s"_p${i + 1}")
          }: _*)
        .filter(asOfCols.indices
          .map(i => col(s"_p$i") > pos(i)).reduce(_ || _))
        .select(col(partDim)).collect().map(_.get(0)).toIndexedSeq
    val touched = (deltaTouched ++ ahead).distinct
    if (touched.isEmpty) {
      saveVec(spark, vecPosPath(viewDir), heads)
      fs.delete(marker, false)
      return registered(heads)
    }
    val viewCur = spark.read.parquet(viewDir)
      .filter(col(partDim).isin(touched: _*))
    // Straggler detection: each partition's applied VECTOR, clamped
    // to the committed vector component-wise (the file invariant).
    val partPos: Map[Any, Seq[Long]] = viewCur
      .groupBy(col(partDim))
      .agg(max(col(asOfCols.head)).as("a0"),
        asOfCols.tail.zipWithIndex.map { case (c, i) =>
          max(col(c)).as(s"a${i + 1}")
        }: _*)
      .collect()
      .map(r => r.get(0) ->
        asOfCols.indices.map(i => math.max(r.getLong(i + 1), pos(i))))
      .toMap
    val groups = touched.groupBy(v => partPos.getOrElse(v, pos))
    val staged = groups.toSeq.flatMap { case (vec, parts) =>
      if (vec.indices.forall(i => vec(i) >= heads(i))) None // at head
      else {
        val deltaV =
          if (vec == pos) delta.filter(col(partDim).isin(parts: _*))
          else vectorDelta(spark, factDir, dims, fKeys, viewDims,
            measures, vec, heads, joinType, fCols)
            .filter(col(partDim).isin(parts: _*))
        val viewPart = viewCur.filter(col(partDim).isin(parts: _*))
          .drop(asOfCols: _*)
        Some((parts,
          stamp(CdcView.applyDelta(viewPart, deltaV, viewDims, names),
            heads)))
      }
    }
    if (staged.nonEmpty) {
      // Marker BEFORE the first rename, deleted after the vector file
      // commits — a crash in between leaves it set for the repair scan.
      fs.create(marker, true).close()
      val stage = staged.map(_._2).reduce(_.unionByName(_))
      MergeUpsert.replacePartitions(spark, viewDir, stage,
        staged.flatMap(_._1), partitionCol = partDim)
    }
    saveVec(spark, vecPosPath(viewDir), heads)
    fs.delete(marker, false)
    registered(heads)
  }

  /** Swap-intent marker (sibling of the view, like the vector file).
    * Present ⇔ a partition swap may have started without its
    * vector-file commit. */
  private def swapMarkerPath(viewDir: String): String =
    viewDir.stripSuffix("/") + "_swapping"
}
