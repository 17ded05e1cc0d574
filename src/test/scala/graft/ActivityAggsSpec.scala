package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.agg.ActivityAggs
import graft.enrich.Enrichments

/** Aggregation golden fixture (FIXTURES.md §3) — batch twins plus the
  * streaming path via MemoryStream (update mode, watermark behavior).
  */
case class Act(
    id: String,
    employee_id: Int,
    activity_type: String,
    page_url: String,
    duration_seconds: Int,
    activity_timestamp: Timestamp,
    device_type: String)

class ActivityAggsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // 3 employees × 2 hours; durations chosen for integer avgs
  private val fixture = Seq(
    Act("1", 1, "page_view", "/a", 10, ts("2025-01-02 10:05:00"), "mobile"),
    Act("2", 1, "page_view", "/b", 20, ts("2025-01-02 10:15:00"), "mobile"),
    Act("3", 1, "page_view", "/a", 30, ts("2025-01-02 10:59:59"), "mobile"),
    Act("4", 1, "page_view", "/c", 40, ts("2025-01-02 11:00:00"), "mobile"), // next window
    Act("5", 2, "click", "/a", 100, ts("2025-01-02 10:30:00"), "tablet"),
    Act("6", 2, "click", "/a", 200, ts("2025-01-02 10:40:00"), "tablet"),
    Act("7", 3, "login", "/login", 5, ts("2025-01-02 11:30:00"), "desktop"))

  test("hourly batch aggregation matches hand-computed groups") {
    val enriched = Enrichments.enrichActivities(fixture.toDF())
    val out = ActivityAggs.hourly(enriched)
      .orderBy(col("window_start"), col("employee_id"))
      .collect()
    assert(out.length == 4)
    val g1 = out(0) // emp 1, hour 10
    assert(g1.getAs[Long]("activity_count") == 3)
    assert(g1.getAs[Long]("total_duration") == 60)
    assert(g1.getAs[Double]("avg_duration") == 20.0)
    assert(g1.getAs[scala.collection.Seq[String]]("unique_pages").toSeq == Seq("/a", "/b"))
    assert(g1.getAs[String]("primary_device") == "Mobile")
    assert(g1.getAs[Timestamp]("window_start") == ts("2025-01-02 10:00:00"))
    assert(g1.getAs[Timestamp]("window_end") == ts("2025-01-02 11:00:00"))
    val g2 = out(1) // emp 2, hour 10
    assert(g2.getAs[Long]("activity_count") == 2)
    assert(g2.getAs[Double]("avg_duration") == 150.0)
    // 10:59:59 belongs to hour 10; 11:00:00 starts the next window
    val g3 = out(2)
    assert(g3.getAs[Int]("employee_id") == 1 &&
      g3.getAs[Timestamp]("window_start") == ts("2025-01-02 11:00:00") &&
      g3.getAs[Long]("activity_count") == 1)
  }

  test("daily batch aggregation: exact distinct employees per device") {
    val enriched = Enrichments.enrichActivities(fixture.toDF())
    val out = ActivityAggs.daily(enriched)
      .orderBy(col("activity_type"), col("device_category"))
      .collect()
    assert(out.length == 3) // click/Tablet, login/Desktop, page_view/Mobile
    val pv = out.find(_.getAs[String]("activity_type") == "page_view").get
    assert(pv.getAs[Long]("unique_employees") == 1)
    assert(pv.getAs[Long]("activity_count") == 4)
    assert(pv.getAs[String]("aggregation_type") == "daily_device")
  }

  test("streaming hourly agg (update mode) emits and revises groups across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Act]
    val enriched = Enrichments.enrichActivities(mem.toDF())
    val q = ActivityAggs.hourlyStreaming(enriched, "2 hours")
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("update").start()
    try {
      mem.addData(fixture.take(2): _*)
      q.processAllAvailable()
      val afterB1 = spark.table("hourly_test")
        .filter(col("employee_id") === 1).orderBy(col("activity_count").desc).collect()
      assert(afterB1.nonEmpty && afterB1(0).getAs[Long]("activity_count") == 2)

      mem.addData(fixture(2)) // same group, new count 3
      q.processAllAvailable()
      val afterB2 = spark.table("hourly_test")
        .filter(col("employee_id") === 1).orderBy(col("activity_count").desc).collect()
      assert(afterB2(0).getAs[Long]("activity_count") == 3) // revised emission
      assert(afterB2(0).getAs[Long]("unique_pages_approx") == 2) // HLL exact at tiny n
    } finally q.stop()
  }

  test("streaming sliding windows: each event lands in exactly two 1h/30min windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Act]
    val q = mem.toDF()
      .withWatermark("activity_timestamp", "2 hours")
      .groupBy(window(col("activity_timestamp"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode("update").start()
    try {
      mem.addData(fixture.head) // 10:05:00
      q.processAllAvailable()
      val rows = spark.table("sliding_test").orderBy(col("ws")).collect()
      assert(rows.map(_.getAs[Timestamp]("ws")).toSeq ==
        Seq(ts("2025-01-02 09:30:00"), ts("2025-01-02 10:00:00")))
      assert(rows.forall(_.getAs[Long]("n") == 1))
    } finally q.stop()
  }

  test("checkpoint recovery: aggregation state survives a query restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("agg_ckpt").toString
    val mem = MemoryStream[Act]
    // memory sink refuses checkpoint recovery; foreachBatch supports it
    val emissions = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    // typed function value disambiguates the Scala/Java foreachBatch
    // overloads under Scala 2.13
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (batch, _) =>
      emissions.synchronized {
        emissions ++= batch.select(col("employee_id"), col("activity_count"))
          .collect().map(r => (r.getInt(0), r.getLong(1)))
      }
    def start() =
      ActivityAggs.hourlyStreaming(Enrichments.enrichActivities(mem.toDF()), "2 hours")
        .writeStream
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

    val q1 = start()
    try {
      mem.addData(fixture.take(2): _*) // emp 1, hour 10: count 2
      q1.processAllAvailable()
    } finally q1.stop()
    assert(emissions.synchronized(emissions.contains((1, 2L))))

    // restart from the SAME checkpoint: the state store must resume,
    // so the next event REVISES the group to 3 rather than starting at 1
    val q2 = start()
    try {
      mem.addData(fixture(2))
      q2.processAllAvailable()
      assert(emissions.synchronized(emissions.contains((1, 3L))))
    } finally q2.stop()
  }

  test("watermark drops events later than the delay behind max event time") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Act]
    val enriched = Enrichments.enrichActivities(mem.toDF())
    val q = ActivityAggs.hourlyStreaming(enriched, "1 hour")
      .writeStream.format("memory").queryName("wm_test")
      .outputMode("update").start()
    try {
      mem.addData(Act("a", 9, "login", "/x", 1, ts("2025-01-02 18:00:00"), "mobile"))
      q.processAllAvailable() // watermark advances to 17:00
      mem.addData(Act("b", 9, "login", "/x", 1, ts("2025-01-02 15:30:00"), "mobile"))
      q.processAllAvailable() // 15:30 < watermark → dropped
      val rows = spark.table("wm_test").filter(col("employee_id") === 9).collect()
      assert(rows.map(_.getAs[Timestamp]("window_start")).distinct.toSeq ==
        Seq(ts("2025-01-02 18:00:00")))
    } finally q.stop()
  }
}
