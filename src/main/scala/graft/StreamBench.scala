package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.agg.ActivityAggs
import graft.enrich.Enrichments
import graft.model.Schemas
import graft.cdc.Debezium

/** Streaming throughput benchmark: Debezium-envelope JSON → two-phase
  * CDC parse → enrichment → watermarked hourly aggregation, through
  * MemoryStream micro-batches. Prints events/s for the full pipeline.
  *
  * Context (BASELINE.md): the reference processes micro-batches on a
  * 30 s trigger with undisclosed volume; this measures how many CDC
  * events/second the same logical pipeline sustains per node here.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val parts = args.sliding(2).collectFirst { case Array("--partitions", n) => n.toInt }
      .getOrElse(32)
    val spark = GraftSession.build(shufflePartitions = parts)
    args.sliding(2).collectFirst { case Array("--statestore", "rocksdb") =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    }
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val eventsPerBatch = 100000
    val numBatches = 5

    // pre-render CDC envelope JSON lines (generation excluded from timing)
    def envelopeBatch(batch: Int): Seq[String] =
      (0 until eventsPerBatch).map { i =>
        val id = batch * eventsPerBatch + i
        // event time ADVANCES batch over batch (day = batch index) so the
        // watermark never drops the timed events as late
        val after =
          s"""{\\"id\\":\\"a-$id\\",\\"employee_id\\":${id % 500},\\"activity_type\\":\\"${Seq("login", "click", "view")(id % 3)}\\",""" +
            s"""\\"page_url\\":\\"/p/${id % 97}\\",\\"duration_seconds\\":${id % 400},""" +
            s"""\\"activity_timestamp\\":\\"2025-01-${f"${batch + 2}%02d"}T${10 + id % 8}:${10 + id % 49}:00Z\\",\\"device_type\\":\\"mobile\\"}"""
        s"""{"payload": {"after": "$after", "op": "${if (id % 10 == 0) "d" else "c"}", "ts_ms": ${1735813800000L + id}}}"""
      }
    val batches = (0 until numBatches).map(envelopeBatch)

    val mem = MemoryStream[String]
    // MemoryStream delivers each addData block as ONE partition — fan the
    // raw wire out before the (expensive) two-phase JSON parse, exactly
    // as a production job sets minPartitions on a single-partition topic
    val parsed = Debezium.parse(mem.toDF().repartition(parts), Schemas.activity)
    val enriched = Enrichments.enrichActivities(parsed)
    val stateless = args.contains("--stateless")
    val q =
      if (stateless)
        // aggregate over PARSED columns — a bare count would let column
        // pruning delete the phase-2 parse and enrichment entirely
        enriched.select(
          sum(length(col("page_url"))).as("chars"),
          sum(col("duration_seconds")).as("dur"),
          count_if(col("is_business_hours")).as("bh"))
          .writeStream.format("memory").queryName("sb_agg")
          .outputMode("complete").start()
      else if (args.contains("--noop"))
        ActivityAggs.hourlyStreaming(enriched, "2 hours")
          .writeStream.format("noop")
          .outputMode("update").start()
      else
        ActivityAggs.hourlyStreaming(enriched, "2 hours")
          .writeStream.format("memory").queryName("sb_agg")
          .outputMode("update").start()
    try {
      // warm-up batch (codegen/state-store init excluded)
      mem.addData(batches.head: _*)
      q.processAllAvailable()
      val t0 = System.nanoTime()
      batches.tail.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val dt = (System.nanoTime() - t0) / 1e9
      val n = (numBatches - 1).toLong * eventsPerBatch
      val eps = n / dt
      println(f"streamed $n CDC events in $dt%.2f s -> ${eps}%.0f events/s " +
        f"(parse+enrich+windowed agg, ${spark.sparkContext.defaultParallelism} threads)")
      if (!args.contains("--noop"))
        // update-mode memory sink APPENDS revisions — count distinct groups
        println(s"agg groups: ${spark.table("sb_agg").dropDuplicates().count()}")
    } finally q.stop()
    spark.stop()
  }
}
