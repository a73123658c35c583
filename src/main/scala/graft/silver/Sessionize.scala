package graft.silver

import graft.ingest.Events
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D1: keep-latest dedup (reference silver_user_session_events.py:87-89):
  * row_number over (partition by event_id order by ts desc), keep rn=1.
  * One shuffle on the dedup key; at scale the dedup key should be the
  * natural event identity so the subsequent session groupBy can reuse a
  * compatible partitioning where possible.
  */
object Dedup {
  def keepLatest(events: DataFrame, key: String = "event_id",
                 orderCol: String = "ts_us"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol).desc)
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }
}

/** Gap-based sessionization + the silver session aggregate (A1 + P8/P9).
  *
  * The reference gets `session_id` for free from its event producer and only
  * group-aggregates (silver_user_session_events.py:111-141). Our harness
  * events carry no session id, so we first derive one with the classic
  * lag/cumulative-sum gap method (30-min inactivity), then aggregate with the
  * reference's exact shape: min/max timestamps, duration, max measure,
  * per-event-type existence flags, and the COMPLETE/EXIT/TIMEOUT_EXIT/
  * IN_PROGRESS state machine with a deterministic `asOfUs` instead of the
  * reference's wall clock (SURVEY.md §7.3).
  *
  * Event-type mapping onto the reference lifecycle: view→enter, click→scroll,
  * purchase→complete, error→exit.
  */
object Sessionize {

  /** Adds session_id = "<user_id>_<seq>". Two window passes over the same
    * (user_id)-hash partitioning — Catalyst plans a single shuffle + sort. */
  def assignSessions(events: DataFrame,
                     gapUs: Long = Events.SessionGapUs): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts_us").isNull ||
          col("ts_us") - col("prev_ts_us") > gapUs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_sess")).over(cum))
      .withColumn("session_id",
        concat(col("user_id").cast("string"), lit("_"),
          col("session_seq").cast("string")))
      .drop("prev_ts_us", "new_sess", "session_seq")
  }

  val SessionKey: Seq[String] = Seq("session_id", "user_id", "webtoon_id",
    "episode_id", "platform", "country", "device", "browser", "datetime")

  /** Silver aggregate over events that already carry a producer-assigned
    * session_id (the reference's case — its simulator emits one per
    * reading session, faker_producer.py:209). Skips gap derivation; same
    * aggregate and state machine as [[sessions]]. */
  def sessionsFromProvided(events: DataFrame,
                           asOfUs: Long = Events.AsOfUs): DataFrame =
    aggregate(events, asOfUs)

  /** The silver table: one row per session × content × dims × day
    * (reference silver_user_session_events.py:22-50 / SURVEY.md §1.3).
    * Single shuffle on the 9-column key with map-side partial aggregation. */
  def sessions(events: DataFrame, asOfUs: Long = Events.AsOfUs): DataFrame =
    aggregate(assignSessions(events), asOfUs)

  private def aggregate(events: DataFrame, asOfUs: Long): DataFrame = {
    val seen = (t: String) =>
      max(when(col("event_type") === t, 1).otherwise(0)).cast("int")
    events
      .groupBy(SessionKey.map(col): _*)
      .agg(
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"),
        round(max(col("value")), 2).as("max_value"),
        max(col("value_cents")).as("max_value_cents"),
        sum(col("value_cents")).as("sum_value_cents"),
        seen("view").as("seen_enter"),
        seen("click").as("seen_scroll"),
        seen("purchase").as("seen_complete"),
        seen("error").as("seen_exit"))
      .withColumn("duration_ms", expr("(end_us - start_us) div 1000"))
      .withColumn("session_state",
        when(col("seen_complete") === 1, "COMPLETE")
          .when(col("seen_exit") === 1, "EXIT")
          .when(lit(asOfUs) - col("end_us") > Events.TimeoutUs, "TIMEOUT_EXIT")
          .otherwise("IN_PROGRESS"))
      .withColumn("is_complete", col("seen_complete"))
      .withColumn("is_exit",
        when(col("seen_exit") === 1 && col("seen_complete") === 0, 1)
          .otherwise(0).cast("int"))
  }
}
