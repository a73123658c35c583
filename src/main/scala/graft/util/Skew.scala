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

  /** Salted sum/count of `valueCol` per `keyCols`. Returns
    * keyCols :+ (sum_<value>, cnt). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame = {
    val key: Seq[Column] = keyCols.map(col)
    df
      .withColumn("_salt",
        pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(salts.toLong)))
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
    * exactly-once sinks), so the contract is: pre-aggregate exact
    * duplicates into (row, weight) before the join — exact for the
    * join+aggregate composition — or include a unique row id in the
    * fact. [[measuredJoin]] MEASURES per-key content diversity and
    * fails loud when salting cannot split a hot key, instead of
    * silently returning the straggler. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 hotKeys: Seq[Any], salts: Int): DataFrame = {
    require(salts >= 2 && salts <= MaxSalts, s"salts=$salts")
    require(hotKeys.nonEmpty && !hotKeys.contains(null),
      "hotKeys must be non-empty and non-null (null never inner-joins)")
    val f = fact.withColumn("_salt",
      when(col(key).isin(hotKeys: _*),
        pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*),
          lit(salts.toLong)))
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

  /** Measured-arm skewed join: ONE cheap per-key measurement of the
    * fact (map-side combine collapses each task to its distinct keys,
    * so the measurement shuffle moves partial aggregates, never rows —
    * the hot key itself cannot skew its own measurement), then keys
    * past `cap` get the [[saltedJoin]] treatment at a derived salt
    * count; a fact with no hot key joins plain, leaving residual mild
    * skew to AQE's runtime split — the two arms of the same defense,
    * chosen by measurement instead of hope. The hot-key collect is
    * bounded (`maxHotKeys`) and fails loud past the bound: a "hot
    * list" of a million keys means the cap is mis-set for the
    * distribution, and silently salting everything would replicate the
    * dim wholesale.
    *
    * The same measurement carries each key's approximate DISTINCT ROW
    * CONTENT count (`approx_count_distinct` over the full-row hash —
    * fixed-width mergeable state, same map-side combine), because the
    * content-derived salt can only spread a hot key across as many
    * salts as it has distinct rows: a hot key whose rows are mostly
    * byte-identical duplicates would keep its straggler no matter the
    * salt count. That regime fails LOUD here (remedy in the message:
    * pre-aggregate duplicates into a weight column — exact for the
    * join+aggregate composition — or add a unique row id). The sketch
    * runs at rsd 0.3 deliberately: the decision needs only the ORDER
    * OF MAGNITUDE of ndv (1 vs thousands), and the coarse sketch keeps
    * per-key map-side state near 100 bytes instead of the default
    * precision's ~kilobytes — at 100 TB the measurement aggregate
    * holds one state per live key per task, so sketch width, not row
    * count, is its memory bill. The per-salt check carries 2× slack
    * for hash imbalance plus the sketch error.
    *
    * Skew past [[MaxSalts]]×`cap` rows on one key also fails loud
    * rather than silently strangling: at that scale one level of
    * salting cannot bound the per-task share (the per-salt load
    * exceeds `cap` even at the max fan-out), and the fix is
    * hierarchical re-salting — split the hot key's SUB-salts again —
    * which changes the plan shape (two replication levels) and must
    * be an explicit engineering decision, not an implicit constant
    * bump. The message says exactly that. */
  def measuredJoin(fact: DataFrame, dim: DataFrame, key: String,
                   cap: Long = HotKeyRowCap,
                   maxHotKeys: Int = 4096): DataFrame = {
    val hot = fact.groupBy(col(key))
      .agg(count(lit(1)).as("count"),
        approx_count_distinct(
          xxhash64(fact.columns.toIndexedSeq.map(col): _*), 0.3).as("ndv"))
      .filter(col("count") > cap && col(key).isNotNull)
      .orderBy(col("count").desc)
      .limit(maxHotKeys + 1)
      .collect()
    require(hot.length <= maxHotKeys,
      s"more than $maxHotKeys keys exceed $cap rows — raise the cap " +
        "or pre-aggregate; salting this many keys replicates the dim " +
        "wholesale")
    if (hot.isEmpty) fact.join(dim, Seq(key), "inner")
    else {
      val maxRows = hot.map(_.getLong(1)).max
      require(maxRows <= MaxSalts.toLong * cap,
        s"hottest key carries $maxRows rows > MaxSalts($MaxSalts) × " +
          s"cap($cap): one salting level cannot bound its per-task " +
          "share — this regime needs hierarchical re-salting (split " +
          "the hot key's sub-salts again), or pre-aggregation of the " +
          "fact before the join; refusing to run a plan whose salted " +
          "partitions still exceed the task budget")
      val salts = saltsFor(maxRows, cap)
      hot.foreach { r =>
        val rows = r.getLong(1)
        val ndv = math.max(1L, r.getLong(2))
        val perSalt = rows / math.max(1L, math.min(salts.toLong, ndv))
        require(perSalt <= 2L * cap,
          s"hot key ${r.get(0)} carries $rows rows but only ~$ndv " +
            s"distinct row contents: the content-derived salt can " +
            s"spread it over at most ~$ndv tasks (~$perSalt rows " +
            s"each > 2×cap=$cap) — pre-aggregate exact-duplicate " +
            "fact rows into a weight column before the join (exact " +
            "for join+aggregate), or include a unique row id in the " +
            "fact so duplicates hash apart")
      }
      saltedJoin(fact, dim, key, hot.map(_.get(0)).toIndexedSeq, salts)
    }
  }
}
