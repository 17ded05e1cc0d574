package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.ParquetUpsertSink
import graft.streaming.Stateful

/** The streaming loop closed into the table format (the reference's K2
  * topology, multi_source_streaming_processor.py:347-361): TWS
  * sessionizer → graft-upsert sink in foreachBatch, with a crash
  * injected in the worst-case window — AFTER the sink's commit, BEFORE
  * the checkpoint's offset commit. The restart replays the batch; the
  * record keys + precombine must make the replay invisible
  * (exactly-once-EQUIVALENT table state).
  */
class StreamTableLoopSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

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

  test("sessionize→upsert-table survives a post-commit crash with exactly-once-equivalent state") {
    crashReplayScenario(withTimer = false)
  }

  test("timer-armed TWS survives the same crash window (timers in replayed state)") {
    // the EVENT-TIME timer sessionizer registers a watermark-driven
    // flush timer per key in the RocksDB state the checkpoint replay
    // restores — the timer registration path must survive the
    // sink-committed/offsets-uncommitted window exactly like the value
    // state does, and the flush that fires AFTER the replayed batch
    // must emit exactly once into the table. (The processing-time
    // variant free-runs under the system clock and never settles under
    // processAllAvailable — it is driven deterministically with an
    // injected manual trigger clock in the next test instead.)
    crashReplayScenario(withTimer = true)
  }

  test("PT-timer TWS survives the crash window under a manual trigger clock") {
    // the r17 gap, closed: with the SYSTEM clock an armed
    // processing-time timer keeps scheduling wake-up batches and
    // processAllAvailable never settles — but the trigger clock is an
    // injectable `startQuery` parameter (the StreamTest pattern), and
    // org.apache.spark.util.ManualClock is in the public core jar. A
    // batch then runs exactly when the test advances the clock past
    // the next trigger tick, which makes the timer-armed replay
    // deterministic: crash AFTER batch 1's sink commit, restart,
    // REPLAY batch 1 (timers re-armed inside the replayed state),
    // advance past the idle gap, and the flush fires exactly once
    // into the table.
    crashReplayProcessingTime()
  }

  private def pollUntil(deadlineMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + deadlineMs
    var ok = cond
    while (!ok && System.currentTimeMillis() < deadline) { Thread.sleep(100); ok = cond }
    ok
  }

  private def crashReplayProcessingTime(): Unit = withRocksDb {
    val base = java.nio.file.Files.createTempDirectory("graft_loop_pt")
    val actDir = s"$base/acts"; val tblDir = s"$base/table"
    val ckpt = s"$base/ckpt"
    val batch1 = Seq(
      ActivityRow(1, "a", ts("2025-01-02 10:00:00"), 10),
      ActivityRow(1, "b", ts("2025-01-02 10:10:00"), 20),
      ActivityRow(2, "c", ts("2025-01-02 10:00:00"), 5))
    val batch2 = Seq(
      ActivityRow(1, "d", ts("2025-01-02 12:00:00"), 7),
      ActivityRow(2, "e", ts("2025-01-02 13:00:00"), 9),
      ActivityRow(1, "f", ts("2025-01-02 15:00:00"), 1))
    batch1.toDF().coalesce(1).write.parquet(actDir)
    batch2.toDF().coalesce(1).write.mode("append").parquet(actDir)
    val schema = batch1.toDF().schema
    val sink = ParquetUpsertSink(tblDir,
      Seq("employee_id", "session_start"), "pre", "p")
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    val crashFired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val gap = 30L * 60 * 1000
    val intervalMs = 1000L
    val t0 = 1700000000000L // interval-aligned epoch for the manual clock

    def table() = spark.read.format("graft-upsert").load(tblDir)

    def start(clock: org.apache.spark.sql.GraftManualClock) = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(actDir)
        .as[Stateful.ActivityEvent]
      val sessions = Stateful.sessionizeTws(spark, stream,
        gapMillis = gap, withTimer = true).toDF()
      org.apache.spark.sql.GraftStreamClockBridge.startForeachBatch(
        spark, sessions, "pt_loop", ckpt,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(s"$intervalMs milliseconds"),
        clock) { (b, batchId) =>
        sink.upsert(
          b.withColumn("pre", unix_micros(col("session_end")))
            .withColumn("p", concat(lit("b"), pmod(col("employee_id"), lit(2)))),
          batchId)
        if (batchId == 1 && crashOnce.getAndSet(false)) {
          crashFired.set(true)
          throw new RuntimeException("injected crash after sink commit")
        }
        ()
      }
    }

    // — run 1: batch 0 fires at t0 on its own; one tick runs batch 1,
    //   which commits to the sink and then crashes before its offsets —
    val clock1 = new org.apache.spark.sql.GraftManualClock(t0)
    val q1 = start(clock1)
    try {
      assert(pollUntil(120000)(q1.recentProgress.exists(_.batchId == 0)),
        "batch 0 never completed under the manual clock")
      clock1.advance(intervalMs)
      // poll the exception rather than awaitTermination: under full-
      // suite load the crash can land later than a fixed await window,
      // and a timed-out await returns instead of throwing
      assert(pollUntil(180000)(q1.exception.isDefined),
        "the crashing batch never ran after the clock tick")
      assert(q1.exception.get.getMessage.contains("injected crash"),
        q1.exception.get.getMessage)
    } finally scala.util.Try(q1.stop())
    assert(crashFired.get(), "the injected crash must actually fire")
    assert(table().count() == 3,
      "batch 1's sink commit must be visible pre-replay")

    // — run 2: replay batch 1 (idempotent under the record key), then
    //   advance the clock past the idle gap: the PT timers restored
    //   into/re-armed by the replayed state flush BOTH open sessions —
    val clock2 = new org.apache.spark.sql.GraftManualClock(t0 + 60 * 1000)
    val q2 = start(clock2)
    try {
      assert(pollUntil(120000)(q2.recentProgress.nonEmpty),
        "the replay batch never completed")
      clock2.advance(gap + 2 * intervalMs)
      assert(pollUntil(180000)(table().count() == 5),
        s"PT timers never flushed the open sessions; table:\n${table().collect().mkString("\n")}")
    } finally scala.util.Try(q2.stop())

    val result = table()
      .select(col("employee_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_duration"))
      .orderBy(col("employee_id"), col("session_start"))
      .collect()
    assert(result.length == 5, result.mkString("; "))
    assert(result(0).getAs[Timestamp]("session_end") == ts("2025-01-02 10:10:00")
      && result(0).getAs[Int]("n_events") == 2
      && result(0).getAs[Long]("total_duration") == 30L)
    // the timer-flushed tails: employee 1's 15:00 and employee 2's 13:00
    assert(result(2).getAs[Int]("employee_id") == 1 &&
      result(2).getAs[Timestamp]("session_start") == ts("2025-01-02 15:00:00") &&
      result(2).getAs[Int]("n_events") == 1 &&
      result(2).getAs[Long]("total_duration") == 1L)
    assert(result(4).getAs[Int]("employee_id") == 2 &&
      result(4).getAs[Timestamp]("session_start") == ts("2025-01-02 13:00:00") &&
      result(4).getAs[Int]("n_events") == 1 &&
      result(4).getAs[Long]("total_duration") == 9L)
    // exactly-once equivalence under the record key
    val dups = table().groupBy(col("employee_id"), col("session_start"))
      .count().filter(col("count") > 1).count()
    assert(dups == 0, "replay must be idempotent under the record key")
  }

  private def crashReplayScenario(withTimer: Boolean): Unit = {
    withRocksDb {
      val base = java.nio.file.Files.createTempDirectory("graft_loop")
      val actDir = s"$base/acts"; val tblDir = s"$base/table"
      val ckpt = s"$base/ckpt"
      // two files = two micro-batches; sessions span the split so the
      // fold must carry state across the crash too
      val batch1 = Seq(
        ActivityRow(1, "a", ts("2025-01-02 10:00:00"), 10),
        ActivityRow(1, "b", ts("2025-01-02 10:10:00"), 20), // same session
        ActivityRow(2, "c", ts("2025-01-02 10:00:00"), 5))
      val batch2 = Seq(
        ActivityRow(1, "d", ts("2025-01-02 12:00:00"), 7), // closes 1's first
        ActivityRow(2, "e", ts("2025-01-02 13:00:00"), 9), // closes 2's first
        ActivityRow(1, "f", ts("2025-01-02 15:00:00"), 1)) // closes 1's second
      batch1.toDF().coalesce(1).write.parquet(actDir)
      batch2.toDF().coalesce(1).write.mode("append").parquet(actDir)
      val schema = batch1.toDF().schema
      val sink = ParquetUpsertSink(tblDir,
        Seq("employee_id", "session_start"), "pre", "p")
      val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
      val crashFired = new java.util.concurrent.atomic.AtomicBoolean(false)
      def run(): Unit = {
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(actDir)
          .as[Stateful.ActivityEvent]
        val sessions =
          if (withTimer) Stateful.sessionizeTwsEventTime(spark, stream,
            gapMillis = 30L * 60 * 1000, watermarkDelay = "1 minute")
          else Stateful.sessionizeTws(spark, stream,
            gapMillis = 30L * 60 * 1000, withTimer = false)
        val q = sessions
          .toDF()
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: DataFrame, batchId: Long) =>
            sink.upsert(
              b.withColumn("pre", unix_micros(col("session_end")))
                .withColumn("p", concat(lit("b"), pmod(col("employee_id"), lit(2)))),
              batchId)
            if (batchId == 1 && crashOnce.getAndSet(false)) {
              crashFired.set(true)
              throw new RuntimeException("injected crash after sink commit")
            }
            ()
          }
          .start()
        try q.processAllAvailable()
        finally scala.util.Try(q.stop())
        q.exception.foreach(e => throw e)
      }
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] { run() }
      assert(crashFired.get(), "the injected crash must actually fire")
      // the crash window is real: batch 1's sessions ARE in the table
      // (sink committed) though its offsets never committed
      val midRows = spark.read.format("graft-upsert").load(tblDir).count()
      assert(midRows == 3,
        s"batch 1's sink commit must be visible pre-replay, got $midRows")
      run() // restart: batch 1 REPLAYS into the table, then batch 2 runs
      val result = spark.read.format("graft-upsert").load(tblDir)
        .select(col("employee_id"), col("session_start"), col("session_end"),
          col("n_events"), col("total_duration"))
        .orderBy(col("employee_id"), col("session_start"))
        .collect()
      // clean twin: every session but each employee's open last; the
      // event-time variant ALSO flushes employee 2's 13:00 session once
      // the final watermark (14:59) passes its 30-min idle horizon —
      // that flush fires in a timer-service batch AFTER the crash
      // replay, proving the replayed state still carries the timer
      assert(result.length == (if (withTimer) 4 else 3),
        s"got ${result.mkString("; ")}")
      assert(result(0).getAs[Int]("employee_id") == 1 &&
        result(0).getAs[Timestamp]("session_start") == ts("2025-01-02 10:00:00") &&
        result(0).getAs[Timestamp]("session_end") == ts("2025-01-02 10:10:00") &&
        result(0).getAs[Int]("n_events") == 2 &&
        result(0).getAs[Long]("total_duration") == 30L)
      assert(result(1).getAs[Int]("employee_id") == 1 &&
        result(1).getAs[Timestamp]("session_start") == ts("2025-01-02 12:00:00") &&
        result(1).getAs[Int]("n_events") == 1)
      assert(result(2).getAs[Int]("employee_id") == 2 &&
        result(2).getAs[Timestamp]("session_start") == ts("2025-01-02 10:00:00") &&
        result(2).getAs[Int]("n_events") == 1)
      if (withTimer)
        assert(result(3).getAs[Int]("employee_id") == 2 &&
          result(3).getAs[Timestamp]("session_start") == ts("2025-01-02 13:00:00") &&
          result(3).getAs[Timestamp]("session_end") == ts("2025-01-02 13:00:00") &&
          result(3).getAs[Int]("n_events") == 1 &&
          result(3).getAs[Long]("total_duration") == 9L)
      // exactly-once equivalence: the replayed batch upserted, never
      // appended — each record key appears exactly once
      val dups = spark.read.format("graft-upsert").load(tblDir)
        .groupBy(col("employee_id"), col("session_start"))
        .count().filter(col("count") > 1).count()
      assert(dups == 0, "replay must be idempotent under the record key")
    }
  }
}

/** Case class mirror of [[Stateful.ActivityEvent]] for fixture DFs. */
case class ActivityRow(
    employee_id: Int,
    activity_type: String,
    activity_timestamp: Timestamp,
    duration_seconds: Int)
