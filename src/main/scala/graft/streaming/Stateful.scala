package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming extensions beyond the reference (SURVEY §2.9
  * ST5/ST9/ST10 list them as unused there): session windows, arbitrary
  * state via flatMapGroupsWithState, and watermarked stream dedup.
  */
object Stateful {

  case class ActivityEvent(
      employee_id: Int,
      activity_type: String,
      activity_timestamp: Timestamp,
      duration_seconds: Int)

  case class SessionState(
      start: Long,
      lastSeen: Long,
      events: Int,
      totalDuration: Long)

  case class SessionResult(
      employee_id: Int,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Int,
      total_duration: Long)

  /** Built-in session windows: gap-based grouping (5-minute inactivity
    * gap) — the declarative path, preferred when per-session output is
    * an aggregate.
    */
  def sessionWindowAgg(events: Dataset[ActivityEvent], gap: String = "5 minutes"): Dataset[_] =
    events
      .withWatermark("activity_timestamp", "10 minutes")
      .groupBy(
        session_window(col("activity_timestamp"), gap),
        col("employee_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("duration_seconds")).as("total_duration"))

  /** Custom sessionization via flatMapGroupsWithState — the imperative
    * path for semantics session_window can't express (here: emit a
    * session record when the processing-time timeout fires). State per
    * key is one small struct; at scale the state store shards by
    * employee_id hash.
    */
  /** @param withTimeout production mode uses a processing-time timeout
    *        to flush idle sessions; tests pass false (a timeout-armed
    *        query schedules continuous empty batches, which never lets
    *        processAllAvailable settle).
    */
  def sessionize(
      spark: SparkSession,
      events: Dataset[ActivityEvent],
      gapMillis: Long = 5 * 60 * 1000,
      withTimeout: Boolean = true): Dataset[SessionResult] = {
    import spark.implicits._
    val timeout =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.employee_id)
      .flatMapGroupsWithState[SessionState, SessionResult](
        OutputMode.Append(), timeout) {
        (employeeId: Int, batch: Iterator[ActivityEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionResult(employeeId,
              new Timestamp(s.start), new Timestamp(s.lastSeen), s.events, s.totalDuration))
          } else {
            val sorted = batch.toSeq.sortBy(_.activity_timestamp.getTime)
            var closed = List.empty[SessionResult]
            var cur = state.getOption
            // accumulator for arbitrarily-late stragglers: events more
            // than a gap EARLIER than the open session's start belong to
            // a separate, earlier session (the batch twin's
            // gaps-and-islands would never merge them). They chain among
            // themselves; if a later in-batch event widens the open
            // session's start back to within a gap of the chain, the
            // chain merges into the session (bridged), otherwise it is
            // emitted closed at batch end.
            var early = Option.empty[SessionState]
            def flushEarly(): Unit = early.foreach { es =>
              closed ::= SessionResult(employeeId,
                new Timestamp(es.start), new Timestamp(es.lastSeen), es.events, es.totalDuration)
              early = None
            }
            // a widened cur.start may come within gap of the early
            // chain: gaps-and-islands ground truth then has ONE session
            def bridgeEarly(): Unit = (early, cur) match {
              case (Some(es), Some(s)) if s.start - es.lastSeen <= gapMillis =>
                cur = Some(s.copy(
                  start = math.min(s.start, es.start),
                  events = s.events + es.events,
                  totalDuration = s.totalDuration + es.totalDuration))
                early = None
              case _ => ()
            }
            sorted.foreach { e =>
              val t = e.activity_timestamp.getTime
              cur match {
                case Some(s) if s.start - t > gapMillis =>
                  early match {
                    case Some(es) if t - es.lastSeen <= gapMillis =>
                      early = Some(es.copy(
                        lastSeen = math.max(es.lastSeen, t),
                        events = es.events + 1,
                        totalDuration = es.totalDuration + e.duration_seconds))
                    case _ =>
                      flushEarly()
                      early = Some(SessionState(t, t, 1, e.duration_seconds))
                  }
                case Some(s) if t - s.lastSeen <= gapMillis =>
                  // in-gap (possibly out-of-order) events merge WITHOUT
                  // regressing the session frontier: start/lastSeen only
                  // widen — a backwards lastSeen would corrupt later gap
                  // checks
                  cur = Some(s.copy(
                    start = math.min(s.start, t),
                    lastSeen = math.max(s.lastSeen, t),
                    events = s.events + 1,
                    totalDuration = s.totalDuration + e.duration_seconds))
                  if (t < s.start) bridgeEarly()
                case Some(s) =>
                  closed ::= SessionResult(employeeId,
                    new Timestamp(s.start), new Timestamp(s.lastSeen), s.events, s.totalDuration)
                  cur = Some(SessionState(t, t, 1, e.duration_seconds))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.duration_seconds))
              }
            }
            flushEarly()
            cur.foreach { s =>
              state.update(s)
              if (withTimeout) state.setTimeoutDuration(gapMillis)
            }
            closed.reverseIterator
          }
      }
  }

  /** Watermarked stream dedup (ST10): drop repeated record keys within
    * the watermark horizon — bounded state, unlike plain dropDuplicates.
    */
  def dedupWithinWatermark(events: Dataset[ActivityEvent]): Dataset[ActivityEvent] =
    events
      .withWatermark("activity_timestamp", "1 hour")
      .dropDuplicatesWithinWatermark("employee_id", "activity_type", "activity_timestamp")
}
