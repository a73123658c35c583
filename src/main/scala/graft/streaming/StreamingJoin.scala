package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream attribution join: clicks attach to the impressions
  * they follow within the attribution window — the two-live-streams
  * form of `graft.ops.AsOfJoin`'s batch attribution (there the right
  * side is static; here BOTH sides arrive late and out of order).
  *
  * Spark buffers both sides in watermark-bounded state: a row is held
  * only until the other side's watermark passes the end of its join
  * range, so state is O(traffic inside the lateness + attribution
  * window), never O(stream) — the same bounded-state discipline as
  * StreamingDedup / StreamingAnomaly. The range predicate
  * (`click_time` between the impression and impression + window) is
  * what lets the engine derive those eviction bounds; an unconstrained
  * stream-stream join would be unbounded state and Spark rejects it in
  * append mode.
  */
object StreamingJoin {

  /** Attribution window: a click attributes to impressions at most this
    * far back. */
  val WindowMinutes = 30

  /** Inner attribution join of two streaming frames.
    * `imps` needs (user_id, imp_id, imp_time); `clicks` needs
    * (c_user_id, click_id, click_time). Watermarks: 10 min lateness on
    * both sides. */
  def attribute(imps: DataFrame, clicks: DataFrame): DataFrame =
    imps.withWatermark("imp_time", "10 minutes")
      .join(clicks.withWatermark("click_time", "10 minutes"),
        expr("user_id = c_user_id AND " +
          s"click_time >= imp_time AND " +
          s"click_time <= imp_time + interval $WindowMinutes minutes"))
      .select(col("user_id"), col("imp_id"), col("click_id"),
        col("imp_time"), col("click_time"))

  /** The batch replay of the same join, for equivalence testing. */
  def attributeBatch(imps: DataFrame, clicks: DataFrame): DataFrame =
    imps.join(clicks,
        expr("user_id = c_user_id AND " +
          s"click_time >= imp_time AND " +
          s"click_time <= imp_time + interval $WindowMinutes minutes"))
      .select(col("user_id"), col("imp_id"), col("click_id"),
        col("imp_time"), col("click_time"))
}
