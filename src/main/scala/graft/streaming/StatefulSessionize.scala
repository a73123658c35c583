package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via `flatMapGroupsWithState` —
  * the arbitrary-state API (SURVEY §2.9 extension path), complementing
  * [[StreamingSessionize]]'s declarative `session_window` form. Both
  * compute the same sessions; this variant owns the state machine
  * explicitly, which is what a production pipeline needs once sessions
  * carry logic `session_window` cannot express (per-session caps,
  * early-emit heuristics, enrichment against the open state).
  *
  * State per user = the single open session. Events inside a batch fold
  * in event-time order: a gap closes the open session (emitted
  * immediately); otherwise the session extends. The open session closes
  * via EventTimeTimeout once the watermark passes its end + gap —
  * exactly the batch gap rule of graft.silver.Sessionize.
  */
object StatefulSessionize {

  case class SessEvent(user_id: Long, event_time: java.sql.Timestamp,
                       event_type: String, value: Double)

  case class OpenSession(startMs: Long, endMs: Long, n: Long,
                         maxValue: Double, seenComplete: Boolean,
                         seenExit: Boolean)

  case class ClosedSession(user_id: Long, start_time: java.sql.Timestamp,
                           end_time: java.sql.Timestamp, n_events: Long,
                           max_value: Double, seen_complete: Int,
                           seen_exit: Int)

  val DefaultGapMs: Long = 30L * 60 * 1000

  private def close(user: Long, s: OpenSession): ClosedSession =
    ClosedSession(user, new java.sql.Timestamp(s.startMs),
      new java.sql.Timestamp(s.endMs), s.n,
      math.round(s.maxValue * 100).toDouble / 100,
      if (s.seenComplete) 1 else 0, if (s.seenExit) 1 else 0)

  private def fold(s: OpenSession, e: SessEvent): OpenSession =
    OpenSession(s.startMs, e.event_time.getTime, s.n + 1,
      math.max(s.maxValue, e.value),
      s.seenComplete || e.event_type == "purchase",
      s.seenExit || e.event_type == "error")

  private def open(e: SessEvent): OpenSession =
    OpenSession(e.event_time.getTime, e.event_time.getTime, 1, e.value,
      e.event_type == "purchase", e.event_type == "error")

  /** Append-mode stream of closed sessions. */
  def sessions(events: Dataset[SessEvent],
               gapMs: Long = DefaultGapMs): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("event_time", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        (user: Long, batch: Iterator[SessEvent],
         state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            val out = Iterator.single(close(user, state.get))
            state.remove()
            out
          } else {
            val sorted = batch.toSeq.sortBy(_.event_time.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            for (e <- sorted) {
              cur match {
                case Some(s)
                    if e.event_time.getTime - s.endMs > gapMs =>
                  closed += close(user, s)
                  cur = Some(open(e))
                case Some(s) => cur = Some(fold(s, e))
                case None => cur = Some(open(e))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // the timeout must sit strictly past the current watermark
              state.setTimeoutTimestamp(math.max(s.endMs + gapMs,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
        })
  }
}
