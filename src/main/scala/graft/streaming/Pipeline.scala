package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.cdc.Debezium
import graft.enrich.Enrichments
import graft.agg.ActivityAggs
import graft.io.ParquetUpsertSink
import graft.model.Schemas

/** The streaming topology (reference multi_source_streaming_processor
  * .py:307-374): two CDC source streams → parse → enrich → (a) event
  * sinks, (b) windowed aggregation sinks.
  *
  * Reference defects corrected (SURVEY §2.10):
  *  - B1: the Kafka message key is resolved per-stream (employee→id,
  *    activity→employee_id, aggs→composite), not a blanket coalesce of
  *    columns that don't exist;
  *  - B2: aggregate console/kafka output runs in update mode (append
  *    without watermark is rejected by Spark);
  *  - B3: streaming distinct uses approx_count_distinct (HLL++);
  *  - ST4: aggregations are watermarked so state is bounded.
  */
object Pipeline {

  /** Parse + enrich an employee CDC stream. */
  def employeeStream(raw: DataFrame, now: Column = current_date()): DataFrame =
    Enrichments.enrichEmployees(
      Debezium.parse(raw, Schemas.employee, "employee"), now)

  /** Parse + enrich an activity CDC stream. */
  def activityStream(raw: DataFrame, now: Column = current_date()): DataFrame =
    Enrichments.enrichActivities(
      Debezium.parse(raw, Schemas.activity, "activity"), now)

  /** Kafka wire projection (K1 semantics, B1 fixed): explicit key
    * column per stream, value = full-row JSON.
    */
  def toKafkaWire(df: DataFrame, keyCol: Column): DataFrame =
    df.select(
      keyCol.cast("string").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** Attach a Kafka sink (production wiring; format-gated for the
    * offline environment where the kafka jar is absent).
    */
  def kafkaSink(
      wire: DataFrame,
      bootstrap: String,
      topic: String,
      checkpoint: String,
      mode: OutputMode = OutputMode.Append()): DataStreamWriter[Row] =
    wire.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode(mode)
      .trigger(Trigger.ProcessingTime("30 seconds"))

  /** Attach the Hudi-semantics parquet upsert sink via foreachBatch
    * (K2; 2-minute trigger like the reference's Hudi sinks).
    */
  def upsertSink(
      events: DataFrame,
      sink: ParquetUpsertSink,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("2 minutes")): DataStreamWriter[Row] =
    events.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => sink.upsert(batch, id))
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(trigger)

  /** Console monitor sink (K3; update mode for aggregates — B2 fix). */
  def consoleSink(
      df: DataFrame,
      name: String,
      aggregate: Boolean): DataStreamWriter[Row] =
    df.writeStream
      .format("console")
      .queryName(name)
      .option("numRows", "10")
      .option("truncate", "false")
      .outputMode(if (aggregate) OutputMode.Update() else OutputMode.Append())
      .trigger(Trigger.ProcessingTime("30 seconds"))

  /** Full reference topology over two raw CDC streams, returning the
    * started queries. Sinks share the enriched lineage definition;
    * memory-friendly demo subset (kafka sinks omitted when bootstrap is
    * None — offline).
    */
  def start(
      rawEmployees: DataFrame,
      rawActivities: DataFrame,
      outDir: String,
      checkpointRoot: String,
      now: Column = current_date()): Seq[StreamingQuery] = {
    val employees = employeeStream(rawEmployees, now)
    val activities = activityStream(rawActivities, now)
    val hourly = ActivityAggs.hourlyStreaming(activities)
    val daily = ActivityAggs.dailyStreaming(activities)

    val empSink = ParquetUpsertSink(
      s"$outDir/employees", Seq("id"), "processing_timestamp", "processing_date")
    val actSink = ParquetUpsertSink(
      s"$outDir/activities", Seq("id"), "processing_timestamp", "processing_date")

    // start one at a time, stopping the already-started queries if a
    // later start throws (duplicate active memory queryName, a memory
    // sink refusing a non-Complete checkpoint): leaking the first
    // queries running with no handle is the alternative
    val started = scala.collection.mutable.ArrayBuffer.empty[StreamingQuery]
    def tracked(q: => StreamingQuery): StreamingQuery = {
      val s = q; started += s; s
    }
    try Seq(
      tracked(upsertSink(employees, empSink, s"$checkpointRoot/employees",
        Trigger.ProcessingTime("30 seconds")).start()),
      tracked(upsertSink(activities, actSink, s"$checkpointRoot/activities",
        Trigger.ProcessingTime("30 seconds")).start()),
      tracked(hourly.writeStream
        .format("memory").queryName("hourly_agg")
        .option("checkpointLocation", s"$checkpointRoot/hourly")
        .outputMode(OutputMode.Update())
        .trigger(Trigger.ProcessingTime("30 seconds"))
        .start()),
      tracked(daily.writeStream
        .format("memory").queryName("daily_agg")
        .option("checkpointLocation", s"$checkpointRoot/daily")
        .outputMode(OutputMode.Update())
        .trigger(Trigger.ProcessingTime("30 seconds"))
        .start()))
    catch {
      case t: Throwable =>
        started.foreach(q => scala.util.Try(q.stop()))
        throw t
    }
  }

  /** Stream-stream equi-join (SURVEY §2.4's natural extension): enriched
    * activities joined to the employee CDC stream on the FK, both sides
    * watermarked, with a time-range constraint bounding the join state
    * (events only match employee versions from the preceding 24 h).
    * Inner join — Spark requires the range condition to purge state on
    * both sides.
    */
  def streamStreamJoin(
      employees: DataFrame,
      activities: DataFrame): DataFrame = {
    // rename BEFORE watermarking — an alias after withWatermark can drop
    // the event-time tag from the attribute
    val emp = employees
      .select(
        col("id").as("emp_id"), col("name"), col("department"),
        col("department_category"), col("created_at").as("emp_created_at"))
      .withWatermark("emp_created_at", "1 hour")
    val act = activities
      .withWatermark("activity_timestamp", "1 hour")
    act.join(
      emp,
      act("employee_id") === emp("emp_id") &&
        emp("emp_created_at") <= act("activity_timestamp") &&
        emp("emp_created_at") >= act("activity_timestamp") - expr("INTERVAL 24 HOURS"),
      "inner")
  }
}
