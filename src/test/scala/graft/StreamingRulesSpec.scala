package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** RewriteStreamingExactDistinct: the reference's B3 crash case —
  * countDistinct on a streaming aggregation — runs on this engine and
  * produces exact counts.
  */
class StreamingRulesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def act(id: String, emp: Int, t: String) =
    Act(id, emp, "login", "/x", 1, ts(t), "mobile")

  test("countDistinct on a streaming windowed agg is rewritten and yields exact counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Act]
    // the reference's daily-agg shape, written LITERALLY with countDistinct
    val agg = mem.toDF()
      .withWatermark("activity_timestamp", "2 hours")
      .groupBy(window($"activity_timestamp", "1 day"), $"activity_type")
      .agg(countDistinct($"employee_id").as("unique_employees"),
        count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("b3_fixed")
      .outputMode("update").start() // would throw UnsupportedOperationChecker without the rule
    try {
      mem.addData(
        act("1", 1, "2025-01-02 10:00:00"),
        act("2", 2, "2025-01-02 11:00:00"),
        act("3", 1, "2025-01-02 12:00:00")) // dup employee
      q.processAllAvailable()
      mem.addData(act("4", 3, "2025-01-02 13:00:00"), act("5", 3, "2025-01-02 14:00:00"))
      q.processAllAvailable()
      val last = spark.table("b3_fixed").orderBy($"n".desc).collect()(0)
      assert(last.getAs[Long]("unique_employees") == 3) // exact: {1,2,3}
      assert(last.getAs[Long]("n") == 5)
    } finally q.stop()
  }

  test("batch countDistinct is left untouched by the rule") {
    val out = Seq((1, 10), (1, 10), (1, 11)).toDF("g", "v")
      .groupBy($"g").agg(countDistinct($"v").as("d")).collect()
    assert(out(0).getAs[Long]("d") == 2)
  }
}
