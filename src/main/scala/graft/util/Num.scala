package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{round, when}

/** Cross-engine-stable rounding.
  *
  * `round(x, k)` for k > 0 is NOT portable: Spark rounds the shortest
  * decimal representation of the double (BigDecimal.valueOf → HALF_UP), so
  * 37.244999999999997 (printed "37.245") rounds to 37.25, while DuckDB
  * rounds the binary value to 37.24. At scale 0 both engines agree for every
  * double (ties are exactly representable and both round half away from
  * zero), so we only ever round at scale 0:  r(x, k) = round(x·10ᵏ, 0)/10ᵏ.
  * The oracle SQL (graft.oracle.Oracles) mirrors the exact same expression
  * tree so both engines execute identical IEEE operations.
  */
object Num {
  def r(c: Column, k: Int): Column = {
    val p = math.pow(10, k)
    round(c * p, 0) / p
  }

  /** round(num/den, k) with num/den integer columns. */
  def ratio(num: Column, den: Column, k: Int): Column =
    r(num.cast("double") / den, k)

  /** ratio with a den>0 guard (A11 pattern), else 0.0. */
  def guardedRatio(num: Column, den: Column, k: Int): Column =
    when(den > 0, ratio(num, den, k)).otherwise(0.0)
}

/** Physical-layout helpers. */
object Layout {
  /** Round-robin repartition to the session's core count, GATED on the
    * scan actually being under-parallel: only when the input has fewer
    * partitions than half the session's parallelism. The harness tables
    * are single parquet files (one input split), so compute-heavy narrow
    * stages (signatures, pairwise set ops) would otherwise run on one
    * core — those get the spread. A 100 TB table already scans as
    * thousands of splits, and there the gate makes this a no-op instead
    * of a full-table round-robin shuffle on every read. `rdd
    * .getNumPartitions` plans the scan but moves no data. */
  def spread(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < par) df.repartition(par) else df
  }

  /** [[spread]] keyed on the columns the downstream windows/aggregations
    * cluster on, instead of round-robin. Two wins over the RR form when
    * the consumer is keyed (guide §2.4/§2.5):
    *  - HashPartitioning(key) satisfies every downstream
    *    ClusteredDistribution whose clustering is a superset of `cols`,
    *    so the first window/groupBy on the key reuses THIS exchange
    *    instead of adding its own (silver: 3 exchanges → 2, measured
    *    −0.3–0.45 s at sf0.1);
    *  - a keyless repartition(n) first pays a LOCAL SORT of its input
    *    (spark.sql.execution.sortBeforeRepartition, on by default since
    *    SPARK-23207 so retried tasks re-deal identically) — on the
    *    single-split harness tables that sort runs serially in the scan
    *    task; the hash form needs no such sort.
    * Same scale gate as [[spread]]: a table already scanning as many
    * splits skips the shuffle entirely. Key choice must spread evenly —
    * use the natural entity key (user_id, doc_id), never a
    * low-cardinality dim. */
  def spreadBy(df: org.apache.spark.sql.DataFrame, cols: Column*)
      : org.apache.spark.sql.DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < par) df.repartition(par, cols: _*)
    else df
  }

  /** Safe broadcast ceiling for an explicit hint. Spark hard-fails an
    * explicit `broadcast()` past 8 GB / 512M rows (the hint BYPASSES
    * autoBroadcastJoinThreshold — there is no automatic fallback), so
    * hints must be gated by the caller on an estimated build size. */
  val MaxBroadcastBytes: Long = 256L << 20

  /** `broadcast(df)` when the caller-estimated size fits under the
    * ceiling, else the frame unchanged (shuffle join). Use for frames
    * whose size Catalyst cannot see — cached / checkpointed plans carry
    * no stats, so AQE can neither choose nor reject the broadcast. */
  def maybeBroadcast(df: org.apache.spark.sql.DataFrame, estBytes: Long,
                     limit: Long = MaxBroadcastBytes)
      : org.apache.spark.sql.DataFrame =
    if (estBytes <= limit) org.apache.spark.sql.functions.broadcast(df)
    else df
}
