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

  /** Open-session state; `start`/`lastSeen` are epoch MICROseconds:
    * Spark timestamps are µs-precision, and a millisecond-truncated
    * fold would both misjudge gaps within 1 ms of the threshold and
    * emit lossy session bounds (the oracle twin compares µs-exact).
    */
  case class SessionState(
      start: Long,
      lastSeen: Long,
      events: Int,
      totalDuration: Long)

  // getTime already carries ms; the sub-ms remainder lives in getNanos
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def toTs(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Migration net for checkpoints written when SessionState held
    * epoch-MILLIseconds: a restored ms value read as µs lands in
    * January 1970 and silently corrupts every later gap comparison.
    * ms-era epochs (< 1e14 ≈ year 5138) upgrade losslessly; genuine µs
    * epochs for any modern date exceed the cutoff by 10×.
    */
  private def upgradeState(s: SessionState): SessionState =
    if (s.lastSeen != 0L && math.abs(s.lastSeen) < 100000000000000L)
      s.copy(start = s.start * 1000L, lastSeen = s.lastSeen * 1000L)
    else s

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
            val s = upgradeState(state.get)
            state.remove()
            Iterator(SessionResult(employeeId,
              toTs(s.start), toTs(s.lastSeen), s.events, s.totalDuration))
          } else {
            val sorted = batch.toSeq.sortBy(e => micros(e.activity_timestamp))
            val (closed, cur) =
              foldSessionBatch(employeeId, sorted, state.getOption.map(upgradeState), gapMillis)
            cur.foreach { s =>
              state.update(s)
              if (withTimeout) state.setTimeoutDuration(gapMillis)
            }
            closed.iterator
          }
      }
  }

  /** One micro-batch of the sessionizer, factored out so the
    * flatMapGroupsWithState path ([[sessionize]]) and the Spark 4
    * arbitrary-state-v2 path ([[sessionizeTws]]) share byte-identical
    * semantics: fold `sorted` (ascending event time) into `init`,
    * returning the sessions CLOSED by this batch (chronological order)
    * and the still-open session to persist.
    */
  private[streaming] def foldSessionBatch(
      employeeId: Int,
      sorted: Seq[ActivityEvent],
      init: Option[SessionState],
      gapMillis: Long): (List[SessionResult], Option[SessionState]) = {
    val gapMicros = gapMillis * 1000L
    var closed = List.empty[SessionResult]
    var cur = init
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
        toTs(es.start), toTs(es.lastSeen), es.events, es.totalDuration)
      early = None
    }
    // a widened cur.start may come within gap of the early
    // chain: gaps-and-islands ground truth then has ONE session
    def bridgeEarly(): Unit = (early, cur) match {
      case (Some(es), Some(s)) if s.start - es.lastSeen <= gapMicros =>
        cur = Some(s.copy(
          start = math.min(s.start, es.start),
          events = s.events + es.events,
          totalDuration = s.totalDuration + es.totalDuration))
        early = None
      case _ => ()
    }
    sorted.foreach { e =>
      val t = micros(e.activity_timestamp)
      cur match {
        case Some(s) if s.start - t > gapMicros =>
          early match {
            case Some(es) if t - es.lastSeen <= gapMicros =>
              early = Some(es.copy(
                lastSeen = math.max(es.lastSeen, t),
                events = es.events + 1,
                totalDuration = es.totalDuration + e.duration_seconds))
            case _ =>
              flushEarly()
              early = Some(SessionState(t, t, 1, e.duration_seconds))
          }
        case Some(s) if t - s.lastSeen <= gapMicros =>
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
            toTs(s.start), toTs(s.lastSeen), s.events, s.totalDuration)
          cur = Some(SessionState(t, t, 1, e.duration_seconds))
        case None =>
          cur = Some(SessionState(t, t, 1, e.duration_seconds))
      }
    }
    flushEarly()
    // the final early-chain flush lands at the head of `closed` AFTER
    // later cur-closures — a bare reverse would emit it last; sort by
    // start to honor the documented chronological contract exactly
    (closed.reverse.sortBy(r => micros(r.session_start)), cur)
  }

  /** How the TWS sessionizer flushes idle sessions. */
  sealed trait SessionTimerMode
  object SessionTimerMode {
    /** No timers: sessions close only when a newer event arrives
      * (deterministic; what tests and the oracle gate use).
      */
    case object Off extends SessionTimerMode
    /** Wall-clock idle flush — low latency, but replaying the same
      * input can emit different (earlier-flushed) session fragments.
      */
    case object ProcessingTime extends SessionTimerMode
    /** Watermark-driven flush: a session emits when the event-time
      * watermark passes lastSeen + gap — the production mode.
      * Deterministic under replay FOR EVENTS WITHIN THE WATERMARK
      * DELAY (the streaming correctness contract): such an event is
      * admitted regardless of batch boundaries, and once the flush
      * fires, anything that could still extend the session is already
      * late-dropped before the processor. An event MORE disordered
      * than the delay sits in the gray zone every watermarked operator
      * has — admitted or dropped depending on where the batch boundary
      * lands, exactly like a late row at an aggregation.
      */
    case object EventTime extends SessionTimerMode
  }

  /** Sessionizer state machine on the Spark 4 arbitrary-state v2 API
    * ([[org.apache.spark.sql.streaming.StatefulProcessorWithInitialState]]):
    * the same per-batch fold as [[sessionize]], with the open session
    * in a composite-typed [[org.apache.spark.sql.streaming.ValueState]]
    * and idle-session flushes via explicit REGISTERED TIMERS
    * (processing-time or watermark-driven event-time) instead of the
    * one implicit GroupStateTimeout slot — the v2 surface a production
    * pipeline gains multiple named state variables, state TTL,
    * per-key timer control, and batch-bootstrapped initial state from.
    * Requires the RocksDB state store provider (transformWithState's
    * store needs multi-column-family support; the default HDFS-backed
    * store refuses at query start).
    */
  final class SessionProcessor(gapMillis: Long, timers: SessionTimerMode)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Int, ActivityEvent, SessionResult, SessionState] {
    @transient private var session:
      org.apache.spark.sql.streaming.ValueState[SessionState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    /** Bootstrap from a batch-computed open session (e.g. the
      * gaps-and-islands tail of an historical table): the stream picks
      * up mid-session, and the first in-gap event extends it instead
      * of double-counting a fresh one. Arms the idle timer like any
      * new activity — a bootstrapped session that never sees another
      * event must still flush. The caller-supplied state is taken AS
      * IS (epoch µs, the SessionState contract) — the legacy-ms
      * checkpoint shim must not reinterpret a legitimately small epoch
      * (a pre-1973 dataset) as corruption.
      */
    override def handleInitialState(key: Int, initial: SessionState,
        timerValues: org.apache.spark.sql.streaming.TimerValues): Unit = {
      session.update(initial)
      armTimer(initial, timerValues)
    }

    private def armTimer(s: SessionState,
        timerValues: org.apache.spark.sql.streaming.TimerValues): Unit =
      timers match {
        case SessionTimerMode.Off => ()
        case SessionTimerMode.ProcessingTime =>
          // new activity re-arms the idle clock: drop the stale
          // timers first (unlike GroupStateTimeout's single implicit
          // slot, registered timers accumulate — a stale one firing
          // would flush a session that just saw events)
          getHandle.listTimers().foreach(getHandle.deleteTimer)
          getHandle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + gapMillis)
        case SessionTimerMode.EventTime =>
          getHandle.listTimers().foreach(getHandle.deleteTimer)
          // fire when the WATERMARK passes lastSeen + gap; µs→ms
          // rounds UP so the timer never fires before the true instant
          getHandle.registerTimer((s.lastSeen + 999L) / 1000L + gapMillis)
      }

    override def handleInputRows(key: Int, rows: Iterator[ActivityEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionResult] = {
      val sorted = rows.toSeq.sortBy(e => micros(e.activity_timestamp))
      // NO upgradeState here: the legacy-ms shim exists only for
      // checkpoints written by the pre-µs flatMapGroupsWithState path.
      // TWS state is always written in the µs era, and bootstrapped
      // initial state is contractually µs (handleInitialState's "taken
      // AS IS" guarantee) — running the shim on later batches would
      // re-multiply a legitimately small epoch (pre-1973 data) by 1000
      // on the first post-bootstrap read, breaking that guarantee.
      val prev =
        if (session.exists()) Some(session.get()) else None
      val (closed, cur) = foldSessionBatch(key, sorted, prev, gapMillis)
      cur match {
        case Some(s) =>
          session.update(s)
          armTimer(s, timerValues)
        case None => session.clear()
      }
      closed.iterator
    }

    override def handleExpiredTimer(key: Int,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionResult] =
      if (session.exists()) {
        val s = session.get() // µs era by construction — see handleInputRows
        session.clear()
        Iterator(SessionResult(key,
          toTs(s.start), toTs(s.lastSeen), s.events, s.totalDuration))
      } else Iterator.empty
  }

  /** [[sessionize]] on transformWithState (arbitrary state v2). Same
    * contract: emits a session when a newer event closes it, plus — with
    * `withTimer` — when its processing-time idle timer fires. Run it
    * with `spark.sql.streaming.stateStore.providerClass` set to the
    * RocksDB provider.
    */
  def sessionizeTws(
      spark: SparkSession,
      events: Dataset[ActivityEvent],
      gapMillis: Long = 5 * 60 * 1000,
      withTimer: Boolean = true): Dataset[SessionResult] = {
    import spark.implicits._
    events
      .groupByKey(_.employee_id)
      .transformWithState(
        new SessionProcessor(gapMillis,
          if (withTimer) SessionTimerMode.ProcessingTime else SessionTimerMode.Off),
        if (withTimer) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
        else org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** [[sessionizeTws]] with WATERMARK-DRIVEN session flushes
    * (TimeMode.EventTime): a session emits once the watermark passes
    * its frontier + gap — deterministic under replay for events within
    * the watermark delay (unlike the processing-time mode, which can
    * fragment differently per run), and a fired flush cannot race an
    * in-contract extension (such an event would already be
    * late-dropped before the processor; see
    * [[SessionTimerMode.EventTime]] for the out-of-contract gray
    * zone). The production sessionizer shape.
    */
  def sessionizeTwsEventTime(
      spark: SparkSession,
      events: Dataset[ActivityEvent],
      gapMillis: Long = 5 * 60 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[SessionResult] =
    sessionizeTwsEventTimeImpl(spark, events, None, gapMillis, watermarkDelay)

  private def sessionizeTwsEventTimeImpl(
      spark: SparkSession,
      events: Dataset[ActivityEvent],
      initial: Option[Dataset[(Int, SessionState)]],
      gapMillis: Long,
      watermarkDelay: String): Dataset[SessionResult] = {
    import spark.implicits._
    val keyed = events
      .withWatermark("activity_timestamp", watermarkDelay)
      .groupByKey(_.employee_id)
    val proc = new SessionProcessor(gapMillis, SessionTimerMode.EventTime)
    val mode = org.apache.spark.sql.streaming.TimeMode.EventTime()
    initial match {
      case Some(init) =>
        keyed.transformWithState(proc, mode, OutputMode.Append(),
          init.groupByKey(_._1).mapValues(_._2))
      case None =>
        keyed.transformWithState(proc, mode, OutputMode.Append())
    }
  }

  /** [[sessionizeTwsEventTime]] BOOTSTRAPPED from batch state: the
    * initial open session per key (e.g. the gaps-and-islands tail of
    * the historical table the stream resumes from) seeds the state
    * store on the first micro-batch, so a session spanning the
    * batch→stream cutover stays ONE session with correct counts —
    * the restart-from-batch shape every lambda-architecture migration
    * needs.
    */
  def sessionizeTwsBootstrapped(
      spark: SparkSession,
      events: Dataset[ActivityEvent],
      initial: Dataset[(Int, SessionState)],
      gapMillis: Long = 5 * 60 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[SessionResult] =
    sessionizeTwsEventTimeImpl(spark, events, Some(initial), gapMillis,
      watermarkDelay)

  /** Watermarked stream dedup (ST10): drop repeated record keys within
    * the watermark horizon — bounded state, unlike plain dropDuplicates.
    */
  def dedupWithinWatermark(events: Dataset[ActivityEvent]): Dataset[ActivityEvent] =
    events
      .withWatermark("activity_timestamp", "1 hour")
      .dropDuplicatesWithinWatermark("employee_id", "activity_type", "activity_timestamp")

  /** Replay-suppression dedup on NATIVE STATE TTL (the arbitrary-state
    * v2 feature the sessionizer doesn't use): one boolean ValueState
    * per record key with `TTLConfig(ttl)` — the store expires the
    * entry itself, no timers, no manual cleanup scan. This is the
    * PROCESSING-time twin of [[dedupWithinWatermark]]: the watermark
    * version bounds state by event-time disorder (drop a key seen
    * within the horizon), this one bounds it by wall-clock retention
    * (suppress at-least-once replays for `ttl`, then re-admit) — the
    * shape an ingest edge uses against producer retries, where replays
    * arrive minutes apart regardless of their event time.
    */
  final class DedupProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, ActivityEvent, ActivityEvent] {
    @transient private var seen:
      org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        org.apache.spark.sql.Encoders.scalaBoolean,
        org.apache.spark.sql.streaming.TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[ActivityEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[ActivityEvent] =
      if (seen.exists()) Iterator.empty // expired entries read as absent
      else { seen.update(true); rows.take(1) }
  }

  /** First occurrence of each (employee, activity, event-time) key per
    * `ttl` window; replays inside the window drop, the key re-admits
    * after expiry. TTL state requires processing-time mode + RocksDB.
    */
  def dedupTws(
      spark: SparkSession,
      events: Dataset[ActivityEvent],
      ttl: java.time.Duration): Dataset[ActivityEvent] = {
    import spark.implicits._
    events
      .groupByKey(e =>
        s"${e.employee_id}|${e.activity_type}|${e.activity_timestamp}")
      .transformWithState(
        new DedupProcessor(ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
