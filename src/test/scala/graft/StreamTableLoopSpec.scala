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
    // variant cannot be driven deterministically here: an armed PT
    // timer keeps the engine scheduling wake-up batches, so
    // processAllAvailable never settles — see StatefulSpec's timer
    // test. Event-time timers are watermark-driven and settle.)
    crashReplayScenario(withTimer = true)
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
