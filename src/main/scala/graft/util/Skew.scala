package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys.
  *
  * AQE's skew-join split handles joins; for aggregations whose key
  * distribution is pathological (one user/webtoon producing a large share
  * of all events), two-phase salted aggregation bounds the largest
  * reduce-side partition: phase 1 aggregates on (key, salt) — the hot key's
  * rows spread over `salts` reducers — phase 2 combines the partials on the
  * key alone, touching only #keys × salts rows. Correct for algebraic
  * aggregates (sum/count/min/max); the salt derives from row content, not
  * randomness, so results are deterministic and re-runnable.
  */
object Skew {

  /** The full-row content hash every salt/measurement here derives
    * from, restricted to HASHABLE columns: Spark's `xxhash64` refuses
    * MapType (at any nesting depth — map iteration order makes the
    * hash ill-defined), so a fact carrying a map column would fail at
    * ANALYSIS time even when no key is hot. Dropping unhashable
    * columns only COARSENS the salt (rows differing solely in a map
    * value share a salt — correctness never depends on salt spread);
    * a row with no hashable columns at all hashes to a constant, so
    * content salting cannot split it and [[measuredJoin]]'s ndv
    * measurement reads it as duplicate-dominated — routing to
    * [[hybridJoin]], the arm that handles exactly that regime. */
  private def containsMap(
      dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    dt match {
      case _: MapType => true
      case ArrayType(et, _) => containsMap(et)
      case st: StructType => st.fields.exists(f => containsMap(f.dataType))
      case _ => false
    }
  }

  private def contentHash(df: DataFrame): Column = {
    val hashable = df.schema.fields.toIndexedSeq
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name))
    if (hashable.isEmpty) lit(0L) else xxhash64(hashable: _*)
  }

  /** Salted sum/count of `valueCol` per `keyCols`. Returns
    * keyCols :+ (sum_<value>, cnt). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame = {
    val key: Seq[Column] = keyCols.map(col)
    df
      .withColumn("_salt",
        pmod(contentHash(df), lit(salts.toLong)))
      .groupBy(key :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(key: _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("cnt"))
  }

  /** Per-key fact rows a single join task may carry before the key is
    * declared hot: past ~2¹⁶ probe rows one reducer becomes the
    * straggler every other task waits on (the IntervalJoin.HotBucketCap
    * task-budget reasoning applied to a shuffle join's build/probe). */
  val HotKeyRowCap: Long = 65536L

  /** Replication bound for [[saltedJoin]]: the dim side's hot rows are
    * replicated ×salts, so the bound caps replication at |hot| × 1024
    * rows — metadata-scale for any honest hot-key list. Skew so extreme
    * that max/cap exceeds this needs hierarchical re-salting, not a
    * bigger constant. */
  val MaxSalts: Int = 1024

  /** The measured-arm salt count: enough ways that no salt partition
    * of the hottest key exceeds the cap, at least 2 (a hot key must
    * actually SPLIT), at most [[MaxSalts]]. */
  def saltsFor(maxKeyRows: Long, cap: Long = HotKeyRowCap): Int =
    math.min(MaxSalts.toLong,
      math.max(2L, (maxKeyRows + cap - 1) / cap)).toInt

  /** Deterministic replicated-salt inner equi-join on `key` — the
    * explicit-plan answer to single-key join skew. A shuffle join
    * partitions both sides by the key, so a key carrying a large share
    * of the fact funnels that share through ONE task; AQE's skew-join
    * split (the other arm — `spark.sql.adaptive.skewJoin`, what the
    * reference configures) repairs this at runtime but only past its
    * size thresholds and only for sort-merge shapes. Salting makes the
    * split part of the PLAN: fact rows of a hot key scatter over
    * `salts` sub-keys (content-derived hash — deterministic,
    * re-runnable), the dim side replicates its hot rows across all
    * `salts` sub-keys, and the join runs on (key, salt) — every fact
    * row still meets exactly the dim rows of its key, so the result
    * equals the plain join ROW FOR ROW (SkewJoinSpec), while the hot
    * key's work spreads over `salts` tasks. Cold keys pay one constant
    * salt (no fan-out). Works for dim sides with duplicate keys (each
    * dim row replicates).
    *
    * Duplicate-content limitation: the salt is a hash of the WHOLE
    * fact row, so byte-identical duplicates of a hot key all land on
    * ONE salt — a hot key dominated by repeated rows (a
    * constant-payload heartbeat event) keeps its straggler despite the
    * salting (correctness unaffected). The disambiguators that would
    * spread them are nondeterministic under task retry
    * (`spark_partition_id`, `monotonically_increasing_id` — a retried
    * task would re-salt rows differently, breaking re-runnability and
    * exactly-once sinks), so duplicate-heavy hot keys need a
    * different ARM, not a different salt: [[measuredJoin]] MEASURES
    * per-key content diversity and escalates those keys to
    * [[hybridJoin]] (broadcast-hot — no shuffle, so duplicates cannot
    * funnel), failing loud only when both sides are hot. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 hotKeys: Seq[Any], salts: Int): DataFrame = {
    require(salts >= 2 && salts <= MaxSalts, s"salts=$salts")
    require(hotKeys.nonEmpty && !hotKeys.contains(null),
      "hotKeys must be non-empty and non-null (null never inner-joins)")
    val f = fact.withColumn("_salt",
      when(col(key).isin(hotKeys: _*),
        pmod(contentHash(fact), lit(salts.toLong)))
        .otherwise(lit(0L)))
    // explode_outer + isNotNull filter, not plain explode: the array is
    // DERIVED (sequence/array), and InferFiltersFromGenerate would
    // otherwise inline the builder per element (the PlanSpec-guarded
    // derived-array pitfall).
    val d = dim
      .withColumn("_salts",
        when(col(key).isin(hotKeys: _*),
          sequence(lit(0L), lit(salts.toLong - 1)))
          .otherwise(array(lit(0L))))
      .withColumn("_salt", explode_outer(col("_salts")))
      .filter(col("_salt").isNotNull)
      .drop("_salts")
    f.join(d, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Hybrid hot-broadcast / cold-shuffle inner equi-join: the hot
    * keys' DIM rows broadcast and their fact rows join WHERE THEY SIT
    * (a broadcast hash join never shuffles its probe side — no
    * reducer funnel, no straggler, regardless of how many rows, or
    * how many byte-identical DUPLICATE rows, one key carries); cold
    * keys take the ordinary shuffle join. Equals the plain inner join
    * row for row — the hot/cold split partitions the key space, and
    * null keys never inner-join on either path. This is the arm for
    * the two regimes content salting cannot bound: duplicate-dominated
    * hot keys (every copy hashes to one salt) and volume past
    * [[MaxSalts]]×cap (the per-salt share exceeds the task budget even
    * at max fan-out). Its own precondition is the OTHER side: the hot
    * keys' dim rows must be broadcastable — [[measuredJoin]] measures
    * that too and fails loud when both sides are hot. */
  def hybridJoin(fact: DataFrame, dim: DataFrame, key: String,
                 hotKeys: Seq[Any]): DataFrame = {
    require(hotKeys.nonEmpty && !hotKeys.contains(null),
      "hotKeys must be non-empty and non-null (null never inner-joins)")
    val isHot = col(key).isin(hotKeys: _*)
    fact.filter(isHot)
      .join(broadcast(dim.filter(isHot)), Seq(key), "inner")
      .unionByName(
        fact.filter(!isHot).join(dim, Seq(key), "inner"))
  }

  /** Dim-side rows the [[hybridJoin]] arm may broadcast for the hot
    * keys before [[measuredJoin]] declares BOTH sides hot and refuses:
    * past ~2²⁰ rows the broadcast itself becomes the straggler
    * (build + ship per task), and no arm here bounds a join where one
    * key is heavy on both sides — that needs pre-aggregation or a
    * different algorithm, an explicit engineering decision. */
  val MaxDimHotRows: Long = 1L << 20

  /** Measured-arm skewed join — escalation chosen by MEASUREMENT, not
    * hope. ONE cheap per-key aggregate of the fact (map-side combine
    * collapses each task to its distinct keys, so the measurement
    * shuffle moves partial aggregates, never rows — the hot key itself
    * cannot skew its own measurement) yields each key's row count AND
    * its approximate DISTINCT ROW CONTENT count
    * (`approx_count_distinct` over the full-row hash at rsd 0.3 —
    * the decision needs only ndv's order of magnitude, and the coarse
    * sketch keeps per-key map-side state near 100 bytes; at 100 TB the
    * aggregate holds one state per live key per task, so sketch width,
    * not row count, is its memory bill). Then:
    *
    *  1. no key past `cap` → PLAIN join (residual mild skew is AQE's
    *     runtime split — the other arm of the same defense);
    *  2. hot keys whose content diversity lets a salt of ≤[[MaxSalts]]
    *     ways bound the per-task share (2× slack for hash imbalance +
    *     sketch error) → [[saltedJoin]] — memory-flat, no broadcast;
    *  3. duplicate-dominated or beyond-MaxSalts hot keys →
    *     [[hybridJoin]], PROVIDED the hot keys' dim rows fit the
    *     broadcast budget (one cheap dim-side count);
    *  4. hot on BOTH sides → fail loud: no join arm bounds that —
    *     pre-aggregate one side (exact for join+aggregate) first.
    *
    * The hot-key collect is bounded (`maxHotKeys`) and fails loud past
    * the bound: a "hot list" of a million keys means the cap is
    * mis-set for the distribution, and salting or broadcasting that
    * many keys replicates the dim wholesale. */
  def measuredJoin(fact: DataFrame, dim: DataFrame, key: String,
                   cap: Long = HotKeyRowCap,
                   maxHotKeys: Int = 4096,
                   maxDimHotRows: Long = MaxDimHotRows): DataFrame = {
    val hot = fact.groupBy(col(key))
      .agg(count(lit(1)).as("count"),
        approx_count_distinct(contentHash(fact), 0.3).as("ndv"))
      .filter(col("count") > cap && col(key).isNotNull)
      .orderBy(col("count").desc)
      .limit(maxHotKeys + 1)
      .collect()
    require(hot.length <= maxHotKeys,
      s"more than $maxHotKeys keys exceed $cap rows — raise the cap " +
        "or pre-aggregate; salting this many keys replicates the dim " +
        "wholesale")
    if (hot.isEmpty) return fact.join(dim, Seq(key), "inner")
    val hotKeys = hot.map(_.get(0)).toIndexedSeq
    val maxRows = hot.map(_.getLong(1)).max
    val salts = saltsFor(maxRows, cap)
    val saltable = maxRows <= MaxSalts.toLong * cap && hot.forall { r =>
      val rows = r.getLong(1)
      val ndv = math.max(1L, r.getLong(2))
      rows / math.max(1L, math.min(salts.toLong, ndv)) <= 2L * cap
    }
    if (saltable) saltedJoin(fact, dim, key, hotKeys, salts)
    else {
      val dimHotRows =
        dim.filter(col(key).isin(hotKeys: _*)).count()
      require(dimHotRows <= maxDimHotRows,
        s"the hot keys are heavy on BOTH sides: salting cannot split " +
          s"the fact (duplicate-dominated or past MaxSalts($MaxSalts)" +
          s"×cap($cap)) and the dim side carries $dimHotRows hot rows " +
          s"> broadcast budget $maxDimHotRows — no join arm bounds " +
          "this; pre-aggregate one side (exact for the " +
          "join+aggregate composition) or add a unique row id so " +
          "duplicates hash apart")
      hybridJoin(fact, dim, key, hotKeys)
    }
  }
}
