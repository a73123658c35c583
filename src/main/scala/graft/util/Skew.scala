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
}
