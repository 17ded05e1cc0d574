package org.apache.spark.sql

import org.apache.spark.sql.execution.streaming.sources.ForeachBatchSink
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.util.Clock

/** Test-only bridge into `StreamingQueryManager.startQuery`'s
  * `triggerClock` parameter (`private[sql]`, hence this package) — the
  * StreamTest pattern with public-jar parts only:
  * `org.apache.spark.util.ManualClock` drives the
  * ProcessingTimeExecutor, so a processing-time-TIMER query advances
  * batch-by-batch under test control instead of free-running wall
  * time. This is what makes the PT-timer crash-replay scenario
  * deterministically drivable (r17 task #6): with the system clock,
  * armed PT timers keep scheduling wake-up batches and
  * `processAllAvailable` never settles; with a manual clock, a batch
  * runs exactly when the test advances past the next trigger tick.
  *
  * The sink is a real `ForeachBatchSink` (the v1 `Sink` trait extends
  * `Table`, so it feeds `startQuery` directly — the same wiring
  * `DataStreamWriter.foreachBatch` does internally).
  */
/** Public face of `org.apache.spark.util.ManualClock` (the class is
  * `private[spark]`; its methods are public) for specs outside the
  * spark packages.
  */
class GraftManualClock(startMs: Long)
  extends org.apache.spark.util.ManualClock(startMs)

object GraftStreamClockBridge {
  def startForeachBatch(
      spark: SparkSession,
      df: DataFrame,
      name: String,
      checkpoint: String,
      trigger: Trigger,
      clock: Clock)(func: (DataFrame, Long) => Unit): StreamingQuery = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val sink = new ForeachBatchSink[Row](
      (b: Dataset[Row], id: Long) => func(b.toDF(), id), ds.exprEnc)
    cs.streams.startQuery(
      userSpecifiedName = Some(name),
      userSpecifiedCheckpointLocation = Some(checkpoint),
      df = ds,
      extraOptions = Map.empty[String, String],
      sink = sink,
      outputMode = OutputMode.Append(),
      useTempCheckpointLocation = false,
      recoverFromCheckpointLocation = true,
      trigger = trigger,
      triggerClock = clock)
  }
}
