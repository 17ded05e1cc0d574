package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Train-batch / score-stream anomaly detection: the same
  * [[queries.Advanced.flagAnomalies]] code path runs over a
  * MemoryStream with batch-trained stats broadcast in, and must flag
  * exactly the rows the batch twin flags.
  */
case class AnomEv(event_id: Long, event_type: String, value: Double)

class StreamAnomalySpec extends SparkSpec {
  import spark.implicits._

  test("streaming anomaly flags equal the batch twin across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"event_type", $"value")
    val stats = queries.Advanced.anomalyStats(ev)
    val batchFlagged = queries.Advanced.flagAnomalies(ev, stats)
      .select("event_id").as[Long].collect().toSet
    assert(batchFlagged.nonEmpty)

    val rows = ev.as[AnomEv].collect()
    val (first, second) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[AnomEv]
    val q = queries.Advanced.flagAnomalies(mem.toDF(), stats)
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    try {
      mem.addData(first.toSeq)
      q.processAllAvailable()
      mem.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("anom_out")
      .select("event_id").as[Long].collect().toSet
    assert(streamed == batchFlagged)
  }
}
