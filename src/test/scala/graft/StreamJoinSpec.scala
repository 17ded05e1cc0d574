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

  test("watermarked stream-static join reads the upsert table's MERGED state as the dim side") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // the enrichment-at-ingest shape a CDC user hits first: the
    // employee dim is a graft-upsert TABLE (two commits — the static
    // side must serve the precombine-merged state, not the union of
    // files), the activity stream carries a watermark, and a windowed
    // per-department rollup runs above the join
    val dir = java.nio.file.Files.createTempDirectory("ssdim").toString + "/t"
    val sink = graft.io.ParquetUpsertSink(dir, Seq("employee_id"), "seq", "dept")
    sink.upsert(Seq(
      (1, 0L, "Technical", "Alice"),
      (2, 0L, "Business", "Bob"))
      .toDF("employee_id", "seq", "dept", "name"), 0)
    sink.upsert(Seq((2, 1L, "Business", "Bobby"))
      .toDF("employee_id", "seq", "dept", "name"), 1) // update wave
    val dim = spark.read.format("graft-upsert").load(dir)
      .select(col("employee_id"), col("name"), col("dept"))
    val actMem = MemoryStream[Act]
    val enriched = actMem.toDF()
      .withWatermark("activity_timestamp", "1 hour")
      .join(broadcast(dim), Seq("employee_id"), "left")
    val agg = enriched
      .groupBy(window(col("activity_timestamp"), "1 hour"),
        coalesce(col("dept"), lit("UNKNOWN")).as("dept"))
      .agg(count(lit(1)).as("n"),
        collect_set(col("name")).as("who"))
    val q = agg.writeStream.format("memory").queryName("ss_upsert_dim")
      .outputMode("complete").start()
    try {
      actMem.addData(
        Act("a1", 1, "login", "/l", 5, ts("2025-01-02 10:10:00"), "mobile"),
        Act("a2", 2, "click", "/c", 9, ts("2025-01-02 10:30:00"), "tablet"),
        Act("a3", 9, "view", "/v", 7, ts("2025-01-02 10:40:00"), "mobile"))
      q.processAllAvailable()
      val rows = spark.table("ss_upsert_dim")
        .select(col("dept"), col("n"), col("who")).collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getSeq[String](2).toSet)).toSet
      assert(rows == Set(
        ("Technical", 1L, Set("Alice")),
        // the MERGED dim row: Bobby (seq 1), never the stale Bob file
        ("Business", 1L, Set("Bobby")),
        ("UNKNOWN", 1L, Set.empty[String])))
    } finally q.stop()
  }
}
