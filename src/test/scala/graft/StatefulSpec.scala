package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Stateful
import graft.streaming.Stateful.ActivityEvent

/** Stateful streaming extensions: session windows,
  * flatMapGroupsWithState sessionization, watermarked dedup.
  */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("session_window groups events within the gap, splits across it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ActivityEvent]
    val q = Stateful.sessionWindowAgg(mem.toDS(), "5 minutes")
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("complete").start()
    try {
      mem.addData(
        ActivityEvent(1, "a", ts("2025-01-02 10:00:00"), 10),
        ActivityEvent(1, "b", ts("2025-01-02 10:03:00"), 20), // same session
        ActivityEvent(1, "c", ts("2025-01-02 10:20:00"), 30)) // new session
      q.processAllAvailable()
      val rows = spark.table("sess_win").orderBy($"session_window.start").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n_events") == 2)
      assert(rows(0).getAs[Long]("total_duration") == 30)
      assert(rows(1).getAs[Long]("n_events") == 1)
    } finally q.stop()
  }

  test("streaming session_window with watermark+append matches the batch twin boundary-for-boundary") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ActivityEvent]
    // append mode: a session row emits only once the watermark passes
    // its end — the production shape for a downstream upsert sink
    val q = Stateful.sessionWindowAgg(mem.toDS(), "5 minutes")
      .writeStream.format("memory").queryName("sess_win_append")
      .outputMode("append").start()
    try {
      val base = Seq(
        ActivityEvent(1, "a", ts("2025-01-02 10:00:00"), 10),
        ActivityEvent(1, "b", ts("2025-01-02 10:03:00"), 20), // same session
        ActivityEvent(1, "c", ts("2025-01-02 10:20:00"), 30), // new session (17 min gap)
        ActivityEvent(2, "d", ts("2025-01-02 10:21:00"), 7))  // other key
      mem.addData(base: _*)
      q.processAllAvailable()
      // advance event time far past every session end + the 10-min
      // watermark delay so append emits all base sessions
      mem.addData(ActivityEvent(2, "flush", ts("2025-01-02 12:00:00"), 1))
      q.processAllAvailable()
      val streamed = spark.table("sess_win_append")
        .select($"employee_id", $"session_window.start".as("start"),
          $"session_window.end".as("end"), $"n_events", $"total_duration")
        .collect().map(r => (r.getInt(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getLong(4))).toSet
      // batch twin: the same session_window aggregation over the same
      // rows as a plain DataFrame (the flush event's session is not
      // emitted by the stream — its watermark never passed — so the
      // batch side aggregates the base events only)
      val batch = base.toDS()
        .groupBy(session_window($"activity_timestamp", "5 minutes"), $"employee_id")
        .agg(count(lit(1)).as("n_events"), sum($"duration_seconds").as("total_duration"))
        .select($"employee_id", $"session_window.start".as("start"),
          $"session_window.end".as("end"), $"n_events", $"total_duration")
        .collect().map(r => (r.getInt(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(streamed == batch)
      assert(streamed.size == 3)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionize closes a session when the gap is exceeded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ActivityEvent]
    val q = Stateful.sessionize(spark, mem.toDS(), withTimeout = false)
      .writeStream.format("memory").queryName("sessionize")
      .outputMode("append").start()
    try {
      mem.addData(
        ActivityEvent(7, "a", ts("2025-01-02 10:00:00"), 10),
        ActivityEvent(7, "b", ts("2025-01-02 10:02:00"), 20),
        ActivityEvent(7, "c", ts("2025-01-02 10:30:00"), 5)) // >5 min gap → closes first
      q.processAllAvailable()
      val rows = spark.table("sessionize").collect()
      assert(rows.length == 1) // first session closed; second still open in state
      assert(rows(0).getAs[Int]("n_events") == 2)
      assert(rows(0).getAs[Long]("total_duration") == 30)
      assert(rows(0).getAs[Timestamp]("session_end") == ts("2025-01-02 10:02:00"))
    } finally q.stop()
  }

  test("sessionize: late cross-batch event widens the session without regressing its frontier") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ActivityEvent]
    val q = Stateful.sessionize(spark, mem.toDS(), withTimeout = false)
      .writeStream.format("memory").queryName("sessionize_late")
      .outputMode("append").start()
    try {
      mem.addData(
        ActivityEvent(9, "a", ts("2025-01-02 10:01:40"), 10), // t=100s
        ActivityEvent(9, "b", ts("2025-01-02 10:03:20"), 20)) // t=200s
      q.processAllAvailable()
      mem.addData(ActivityEvent(9, "late", ts("2025-01-02 10:00:50"), 5)) // t=50s, late
      q.processAllAvailable()
      // frontier stayed at 200s: an event 200s later is still in-gap,
      // so NO session closes
      mem.addData(ActivityEvent(9, "c", ts("2025-01-02 10:06:40"), 7)) // t=400s
      q.processAllAvailable()
      assert(spark.table("sessionize_late").count() == 0)
      // far-future event closes one session spanning 50s..400s, 4 events
      mem.addData(ActivityEvent(9, "d", ts("2025-01-02 11:00:00"), 1))
      q.processAllAvailable()
      val rows = spark.table("sessionize_late").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Int]("n_events") == 4)
      assert(rows(0).getAs[java.sql.Timestamp]("session_start") == ts("2025-01-02 10:00:50"))
      assert(rows(0).getAs[java.sql.Timestamp]("session_end") == ts("2025-01-02 10:06:40"))
    } finally q.stop()
  }

  test("sessionize: arbitrarily-late events become their own earlier session, not a widened one") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ActivityEvent]
    val q = Stateful.sessionize(spark, mem.toDS(), withTimeout = false)
      .writeStream.format("memory").queryName("sessionize_straggler")
      .outputMode("append").start()
    try {
      mem.addData(ActivityEvent(4, "a", ts("2025-01-02 12:00:00"), 10))
      q.processAllAvailable()
      // two stragglers a full hour earlier (far beyond the 5-min gap),
      // 60s apart — batch-twin semantics: ONE separate earlier session,
      // and the open session must stay untouched
      mem.addData(
        ActivityEvent(4, "s1", ts("2025-01-02 11:00:00"), 1),
        ActivityEvent(4, "s2", ts("2025-01-02 11:01:00"), 2))
      q.processAllAvailable()
      val earlyRows = spark.table("sessionize_straggler").collect()
      assert(earlyRows.length == 1)
      assert(earlyRows(0).getAs[java.sql.Timestamp]("session_start") == ts("2025-01-02 11:00:00"))
      assert(earlyRows(0).getAs[java.sql.Timestamp]("session_end") == ts("2025-01-02 11:01:00"))
      assert(earlyRows(0).getAs[Int]("n_events") == 2)
      assert(earlyRows(0).getAs[Long]("total_duration") == 3L)
      // far-future event closes the ORIGINAL session: still 1 event,
      // unwidened by the stragglers
      mem.addData(ActivityEvent(4, "d", ts("2025-01-02 13:00:00"), 1))
      q.processAllAvailable()
      val rows = spark.table("sessionize_straggler").collect()
        .filter(_.getAs[java.sql.Timestamp]("session_start") == ts("2025-01-02 12:00:00"))
      assert(rows.length == 1)
      assert(rows(0).getAs[Int]("n_events") == 1)
    } finally q.stop()
  }

  test("sessionize: straggler chain bridges into the session when a widening event connects them") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ActivityEvent]
    val q = Stateful.sessionize(spark, mem.toDS(), withTimeout = false)
      .writeStream.format("memory").queryName("sessionize_bridge")
      .outputMode("append").start()
    try {
      mem.addData(ActivityEvent(5, "a", ts("2025-01-02 12:00:00"), 10))
      q.processAllAvailable()
      // 11:50 and 11:54 are > gap (5 min) before start=12:00 → early
      // chain; 11:56 widens the session start to 11:56, which is within
      // gap of the chain's 11:54 — gaps (4/2/4 min) make ONE session
      mem.addData(
        ActivityEvent(5, "s1", ts("2025-01-02 11:50:00"), 1),
        ActivityEvent(5, "s2", ts("2025-01-02 11:54:00"), 2),
        ActivityEvent(5, "s3", ts("2025-01-02 11:56:00"), 4))
      q.processAllAvailable()
      assert(spark.table("sessionize_bridge").count() == 0) // nothing closed
      mem.addData(ActivityEvent(5, "d", ts("2025-01-02 13:00:00"), 1))
      q.processAllAvailable()
      val rows = spark.table("sessionize_bridge").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[java.sql.Timestamp]("session_start") == ts("2025-01-02 11:50:00"))
      assert(rows(0).getAs[java.sql.Timestamp]("session_end") == ts("2025-01-02 12:00:00"))
      assert(rows(0).getAs[Int]("n_events") == 4)
      assert(rows(0).getAs[Long]("total_duration") == 17L)
    } finally q.stop()
  }

  /** transformWithState needs a multi-column-family store — point the
    * query at RocksDB for its duration, restore the default after.
    */
  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState sessionizer matches flatMapGroupsWithState batch-for-batch (incl. stragglers + bridge)") {
    implicit val sqlCtx = spark.sqlContext
    // the full cross-batch script: open, straggler chain, bridge via a
    // widening event, then a far-future close — replayed through BOTH
    // state APIs; the shared foldSessionBatch must make them identical
    val script: Seq[Seq[ActivityEvent]] = Seq(
      Seq(ActivityEvent(5, "a", ts("2025-01-02 12:00:00"), 10)),
      Seq(
        ActivityEvent(5, "s1", ts("2025-01-02 11:50:00"), 1),
        ActivityEvent(5, "s2", ts("2025-01-02 11:54:00"), 2),
        ActivityEvent(5, "s3", ts("2025-01-02 11:56:00"), 4)),
      Seq(
        ActivityEvent(4, "x", ts("2025-01-02 09:00:00"), 3),
        ActivityEvent(4, "y", ts("2025-01-02 08:00:00"), 6)), // own earlier session
      Seq(
        ActivityEvent(5, "d", ts("2025-01-02 13:00:00"), 1),
        ActivityEvent(4, "d", ts("2025-01-02 13:00:00"), 1)))
    def run(name: String)(mk: MemoryStream[ActivityEvent] =>
        org.apache.spark.sql.Dataset[Stateful.SessionResult]): Set[(Int, Timestamp, Timestamp, Int, Long)] = {
      val mem = MemoryStream[ActivityEvent]
      val q = mk(mem).writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        script.foreach { batch => mem.addData(batch: _*); q.processAllAvailable() }
        spark.table(name).collect().map(r => (
          r.getAs[Int]("employee_id"),
          r.getAs[Timestamp]("session_start"), r.getAs[Timestamp]("session_end"),
          r.getAs[Int]("n_events"), r.getAs[Long]("total_duration"))).toSet
      } finally q.stop()
    }
    val viaFgws = run("par_fgws")(m =>
      Stateful.sessionize(spark, m.toDS(), withTimeout = false))
    val viaTws = withRocksDb(run("par_tws")(m =>
      Stateful.sessionizeTws(spark, m.toDS(), withTimer = false)))
    assert(viaTws == viaFgws)
    assert(viaTws.size == 3) // bridged 11:50–12:00, key-4 08:00 and 09:00 sessions
    assert(viaTws.contains((5, ts("2025-01-02 11:50:00"), ts("2025-01-02 12:00:00"), 4, 17L)))
  }

  test("transformWithState timer flushes the idle session") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[ActivityEvent]
      val q = Stateful.sessionizeTws(spark, mem.toDS(),
        gapMillis = 300, withTimer = true)
        .writeStream.format("memory").queryName("tws_timer")
        .outputMode("append").start()
      try {
        // 100 ms apart in EVENT time: one session under the 300 ms gap
        // (gapMillis is both the fold's split threshold and the idle
        // timer horizon)
        val base = ts("2025-01-02 10:00:00")
        mem.addData(
          ActivityEvent(7, "a", base, 10),
          ActivityEvent(7, "b", new Timestamp(base.getTime + 100), 20))
        // NO processAllAvailable here: an armed processing-time timer
        // keeps the engine scheduling wake-up batches, so it never
        // settles (the same reason sessionize's tests pass
        // withTimeout=false). The default trigger drains addData on its
        // own; poll the sink until the timer's flush lands.
        val deadline = System.currentTimeMillis() + 60000
        var flushed = Seq.empty[org.apache.spark.sql.Row]
        var nudge = 0
        while (flushed.isEmpty && System.currentTimeMillis() < deadline) {
          Thread.sleep(500)
          // nudge with other-key data in case wake-up batches alone
          // don't run (picked up by the continuous trigger, no
          // processAllAvailable needed)
          nudge += 1
          mem.addData(ActivityEvent(8, s"nudge$nudge",
            ts("2025-01-02 11:00:00"), 1))
          flushed = spark.table("tws_timer")
            .filter(col("employee_id") === 7).collect().toSeq
        }
        assert(flushed.size == 1, "timer must flush employee 7's idle session")
        assert(flushed.head.getAs[Int]("n_events") == 2)
        assert(flushed.head.getAs[Long]("total_duration") == 30L)
        assert(flushed.head.getAs[Timestamp]("session_end") ==
          new Timestamp(base.getTime + 100))
      } finally q.stop()
    }
  }

  test("transformWithState event-time timer flushes when the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[ActivityEvent]
      val q = Stateful.sessionizeTwsEventTime(spark, mem.toDS(),
        gapMillis = 5 * 60 * 1000, watermarkDelay = "1 minute")
        .writeStream.format("memory").queryName("tws_evt")
        .outputMode("append").start()
      try {
        mem.addData(
          ActivityEvent(12, "a", ts("2025-01-02 10:00:00"), 10),
          ActivityEvent(12, "b", ts("2025-01-02 10:02:00"), 20))
        q.processAllAvailable()
        // watermark after batch 1 = 10:01; the timer waits for
        // lastSeen + gap = 10:07 — nothing flushes yet
        assert(spark.table("tws_evt").count() == 0)
        // 10:30 advances the watermark to 10:29 at the NEXT batch's
        // start; the timer then fires deterministically — no wall
        // clock involved (the whole point of event-time timers)
        mem.addData(ActivityEvent(13, "w", ts("2025-01-02 10:30:00"), 1))
        q.processAllAvailable()
        mem.addData(ActivityEvent(13, "w2", ts("2025-01-02 10:31:00"), 2))
        q.processAllAvailable()
        val flushed = spark.table("tws_evt")
          .filter(col("employee_id") === 12).collect()
        assert(flushed.length == 1)
        assert(flushed.head.getAs[Int]("n_events") == 2)
        assert(flushed.head.getAs[Long]("total_duration") == 30L)
        assert(flushed.head.getAs[Timestamp]("session_end") == ts("2025-01-02 10:02:00"))
        // key 13's own session is still open (watermark hasn't passed
        // ITS frontier + gap)
        assert(spark.table("tws_evt").filter(col("employee_id") === 13).count() == 0)
      } finally q.stop()
    }
  }

  test("transformWithState bootstraps from batch-computed open sessions (batch→stream cutover)") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[ActivityEvent]
      // the open tail of the "historical" table: 2 events, 10:00–10:02
      def us(s: String) = ts(s).getTime * 1000L
      val initial = Seq(
        (21, Stateful.SessionState(
          us("2025-01-02 10:00:00"), us("2025-01-02 10:02:00"), 2, 30L))).toDS()
      val q = Stateful.sessionizeTwsBootstrapped(spark, mem.toDS(), initial,
        gapMillis = 5 * 60 * 1000, watermarkDelay = "1 minute")
        .writeStream.format("memory").queryName("tws_boot")
        .outputMode("append").start()
      try {
        // 10:04 is in-gap of the BOOTSTRAPPED frontier (10:02): it must
        // extend that session, not open a fresh one; 11:00 closes it
        mem.addData(
          ActivityEvent(21, "c", ts("2025-01-02 10:04:00"), 7),
          ActivityEvent(21, "d", ts("2025-01-02 11:00:00"), 1))
        q.processAllAvailable()
        val rows = spark.table("tws_boot").collect()
        assert(rows.length == 1)
        assert(rows.head.getAs[Timestamp]("session_start") == ts("2025-01-02 10:00:00"))
        assert(rows.head.getAs[Timestamp]("session_end") == ts("2025-01-02 10:04:00"))
        assert(rows.head.getAs[Int]("n_events") == 3, "bootstrapped counts must carry over")
        assert(rows.head.getAs[Long]("total_duration") == 37L)
      } finally q.stop()
    }
  }

  test("transformWithState bootstrapped state is taken AS IS across batches (no legacy-ms shim)") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[ActivityEvent]
      // a legitimately SMALL µs epoch (1970-era dataset, < the shim's
      // 1e14 cutoff): handleInitialState documents the bootstrapped
      // state is taken as-is, and that must hold on EVERY batch — the
      // legacy-ms checkpoint shim belongs only to the old
      // flatMapGroupsWithState path. Re-applying it on the read-back
      // would multiply start/lastSeen by 1000 (1970 → ~2001) before
      // the session closes.
      val initial = Seq(
        (31, Stateful.SessionState(1000000000L, 1060000000L, 2, 30L))).toDS()
      val q = Stateful.sessionizeTwsBootstrapped(spark, mem.toDS(), initial,
        gapMillis = 5 * 60 * 1000, watermarkDelay = "1 minute")
        .writeStream.format("memory").queryName("tws_boot_asis")
        .outputMode("append").start()
      try {
        // 1970-01-01 01:00:00Z is far past the bootstrapped frontier
        // (00:17:40Z) + gap: it must CLOSE the bootstrapped session
        // with its ORIGINAL µs epochs intact
        mem.addData(ActivityEvent(31, "z", new Timestamp(3600000L), 5))
        q.processAllAvailable()
        val rows = spark.table("tws_boot_asis")
          .filter(col("n_events") === 2).collect()
        assert(rows.length == 1, "the bootstrapped session must close")
        assert(rows.head.getAs[Timestamp]("session_start") == new Timestamp(1000000L),
          "bootstrapped start must survive un-multiplied")
        assert(rows.head.getAs[Timestamp]("session_end") == new Timestamp(1060000L))
        assert(rows.head.getAs[Long]("total_duration") == 30L)
      } finally q.stop()
    }
  }

  test("transformWithState TTL dedup suppresses replays within the TTL and re-admits after expiry") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[ActivityEvent]
      // TTL long enough that NO scheduling delay can expire the entry
      // before the suppression check (awaitCount tolerates 30 s; the
      // TTL must exceed every wait that precedes the replay batch)
      val q = Stateful.dedupTws(spark, mem.toDS(), java.time.Duration.ofSeconds(90))
        .writeStream.format("memory").queryName("tws_ttl_dedup")
        .outputMode("append").start()
      try {
        // NO processAllAvailable anywhere: processing-time mode keeps
        // the engine scheduling batches, so it never settles — the
        // continuous trigger drains addData on its own; poll the sink
        def await(filter: org.apache.spark.sql.Column, n: Long): Unit = {
          val deadline = System.currentTimeMillis() + 30000
          while (spark.table("tws_ttl_dedup").filter(filter).count() < n &&
            System.currentTimeMillis() < deadline) Thread.sleep(200)
          assert(spark.table("tws_ttl_dedup").filter(filter).count() == n)
        }
        val e0 = ActivityEvent(3, "login", ts("2025-01-02 10:00:00"), 10)
        mem.addData(e0, e0, e0.copy(duration_seconds = 99)) // same dedup key 3×
        await(col("employee_id") === 3, 1)
        // replay + a SENTINEL key in one batch: once the sentinel shows
        // up in the sink, the replay was definitely processed — no
        // wall-clock guessing about whether the batch ran yet
        mem.addData(e0, ActivityEvent(4, "sentinel", ts("2025-01-02 10:00:00"), 1))
        await(col("employee_id") === 4, 1)
        assert(spark.table("tws_ttl_dedup").filter(col("employee_id") === 3).count() == 1,
          "a replay inside the TTL must be suppressed")
      } finally q.stop()
    }
  }

  test("transformWithState TTL dedup re-admits a key after the TTL expires") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[ActivityEvent]
      val q = Stateful.dedupTws(spark, mem.toDS(), java.time.Duration.ofSeconds(2))
        .writeStream.format("memory").queryName("tws_ttl_readmit")
        .outputMode("append").start()
      try {
        def awaitCount(n: Long): Unit = {
          val deadline = System.currentTimeMillis() + 30000
          while (spark.table("tws_ttl_readmit").count() < n &&
            System.currentTimeMillis() < deadline) Thread.sleep(200)
          assert(spark.table("tws_ttl_readmit").count() == n)
        }
        val e0 = ActivityEvent(5, "login", ts("2025-01-02 10:00:00"), 10)
        mem.addData(e0)
        awaitCount(1) // the entry's TTL clock starts at THIS batch
        Thread.sleep(5000) // 2.5× the TTL: the store expires the entry itself
        mem.addData(e0)
        awaitCount(2) // an expired key re-admits (TTL retention, not forever-state)
      } finally q.stop()
    }
  }

  test("dropDuplicatesWithinWatermark removes repeats of the same record key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ActivityEvent]
    val q = Stateful.dedupWithinWatermark(mem.toDS())
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    try {
      val e = ActivityEvent(3, "login", ts("2025-01-02 10:00:00"), 10)
      mem.addData(e, e, e.copy(duration_seconds = 99)) // same dedup key 3×
      q.processAllAvailable()
      mem.addData(e) // replay in a later batch, still within watermark
      q.processAllAvailable()
      assert(spark.table("dedup_wm").count() == 1)
    } finally q.stop()
  }
}
