package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of `graft.ops.EventOps.anomalyHourly`: hourly counts
  * per event type arrive as a stream (the output of an upstream
  * watermarked tumbling-window aggregate, which closes buckets in
  * event-time order per key), and each bucket is z-scored against the
  * trailing 24 OBSERVED buckets held in state.
  *
  * State per event type is a fixed ring of ≤ [[Trail]] counts — bounded
  * regardless of stream length or key cardinality (the
  * StreamingDedup/StatefulSessionize rule: no user- or time-scaled
  * state). The z arithmetic is the IDENTICAL IEEE op sequence as the
  * batch query (integer sums, two divisions, one sqrt, one subtraction,
  * scale-4 round — all on JVM doubles here and in codegen there), so
  * streamed output == batch output row-for-row; the spec pins it.
  */
object StreamingAnomaly {

  /** One closed hourly bucket from the upstream windowed aggregate. */
  case class HourBucket(event_type: String, window_start_us: Long,
                        n_events: Long)

  case class Scored(event_type: String, window_start_us: Long,
                    n_events: Long, n_trail: Long, z_score: Double,
                    is_anomaly: Int)

  /** Trailing-window length (observed buckets). */
  val Trail = 24
  /** Minimum trailing observations before scoring. */
  val MinTrail = 8

  /** The shared z rule — exactly the batch expression tree. */
  private[graft] def score(x: Long, trail: Seq[Long]): (Double, Int) = {
    val n = trail.length.toLong
    val sum = trail.sum
    val sumsq = trail.iterator.map(c => c * c).sum
    val varNum = n * sumsq - sum * sum
    val z =
      if (n >= MinTrail && varNum > 0) {
        val raw = (x.toDouble - sum.toDouble / n) /
          math.sqrt(varNum.toDouble / (n * (n - 1)))
        math.round(raw * 10000).toDouble / 10000
      } else 0.0
    (z, if (math.abs(z) >= 3.0) 1 else 0)
  }

  /** Append-mode stream of scored buckets. Buckets inside one batch are
    * folded in window order (the upstream watermark guarantees per-key
    * monotone closes across batches). */
  def scores(buckets: Dataset[HourBucket]): Dataset[Scored] = {
    implicit val outEnc = Encoders.product[Scored]
    implicit val stateEnc = Encoders.kryo[Vector[Long]]
    implicit val keyEnc = Encoders.STRING
    buckets
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (key: String, batch: Iterator[HourBucket],
         state: GroupState[Vector[Long]]) => {
          val sorted = batch.toSeq.sortBy(_.window_start_us)
          var trail = state.getOption.getOrElse(Vector.empty[Long])
          val out = Seq.newBuilder[Scored]
          for (b <- sorted) {
            val (z, flag) = score(b.n_events, trail)
            out += Scored(key, b.window_start_us, b.n_events,
              trail.length.toLong, z, flag)
            trail = (trail :+ b.n_events).takeRight(Trail)
          }
          state.update(trail)
          out.result().iterator
        })
  }
}
