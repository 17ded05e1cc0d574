package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Pipeline

/** Watermarked stream-stream join (SURVEY §2.4 extension). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  case class Emp(id: Int, name: String, department: String,
      department_category: String, created_at: Timestamp)

  private def ts(s: String) = Timestamp.valueOf(s)

  test("activity x employee stream-stream join matches on FK within the time range") {
    implicit val sqlCtx = spark.sqlContext
    val empMem = MemoryStream[Emp]
    val actMem = MemoryStream[Act]
    val joined = Pipeline.streamStreamJoin(empMem.toDF(), actMem.toDF())
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      empMem.addData(
        Emp(1, "Alice", "Engineering", "Technical", ts("2025-01-02 08:00:00")),
        Emp(2, "Bob", "Sales", "Business", ts("2025-01-02 08:00:00")))
      actMem.addData(
        Act("a1", 1, "login", "/l", 5, ts("2025-01-02 10:00:00"), "mobile"),
        Act("a2", 2, "click", "/c", 9, ts("2025-01-02 10:30:00"), "tablet"),
        Act("a3", 3, "view", "/v", 7, ts("2025-01-02 10:40:00"), "mobile"), // no employee
        Act("a4", 1, "view", "/v", 3, ts("2025-01-03 09:00:00"), "mobile")) // > 24h after emp
      q.processAllAvailable()
      val rows = spark.table("ss_join").collect()
      val ids = rows.map(_.getAs[String]("id")).sorted.toSeq
      assert(ids == Seq("a1", "a2")) // a3: no match; a4: outside 24h range
      assert(rows.find(_.getAs[String]("id") == "a1").get.getAs[String]("name") == "Alice")
    } finally q.stop()
  }

  test("stream-static broadcast join enriches the stream without state or watermark") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // tuples, not the Emp case class: nested suite classes can't be
    // encoded by createDataset (no outer scope)
    val static = Seq(
      (1, "Alice", "Technical"),
      (2, "Bob", "Business"))
      .toDF("employee_id", "name", "department_category")
    val actMem = MemoryStream[Act]
    val joined = actMem.toDF()
      .join(broadcast(static), Seq("employee_id"), "left")
      .select(col("id"), col("employee_id"), col("name"), col("department_category"))
    val q = joined.writeStream.format("memory").queryName("stream_static")
      .outputMode("append").start()
    try {
      actMem.addData(
        Act("a1", 1, "login", "/l", 5, ts("2025-01-02 10:00:00"), "mobile"),
        Act("a2", 3, "view", "/v", 7, ts("2025-01-02 10:40:00"), "mobile")) // no dim row
      q.processAllAvailable()
      val rows = spark.table("stream_static").orderBy(col("id")).collect()
      assert(rows.length == 2) // left join: unmatched stream rows survive
      assert(rows(0).getAs[String]("name") == "Alice")
      assert(rows(1).getAs[String]("name") == null)
    } finally q.stop()
  }
}
