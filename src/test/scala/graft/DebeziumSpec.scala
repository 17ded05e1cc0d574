package graft

import graft.cdc.Debezium
import graft.model.Schemas

/** CDC-envelope golden tests (FIXTURES.md §1): create/update kept,
  * delete/snapshot-read dropped, malformed and partial payloads
  * null-safe.
  */
class DebeziumSpec extends SparkSpec {
  import spark.implicits._

  private def parse(values: String*) =
    Debezium.parse(values.toDF("value"), Schemas.activity)

  private val after =
    """{\"id\":\"a-1\",\"employee_id\":1,\"activity_type\":\"page_view\",""" +
      """\"page_url\":\"/dashboard\",\"duration_seconds\":45,""" +
      """\"activity_timestamp\":\"2025-01-02T10:30:00Z\",\"device_type\":\"mobile\"}"""

  test("insert (c) and update (u) are kept; delete (d) and snapshot read (r) dropped") {
    val rows = parse(
      s"""{"payload": {"after": "$after", "op": "c", "ts_ms": 1735813800000}}""",
      s"""{"payload": {"after": "$after", "op": "u", "ts_ms": 1735813800001}}""",
      s"""{"payload": {"after": null, "op": "d", "ts_ms": 1735813800002}}""",
      s"""{"payload": {"after": "$after", "op": "r", "ts_ms": 1735813800003}}""")
      .collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("event_timestamp")).sorted.toSeq ==
      Seq(1735813800000L, 1735813800001L))
    assert(rows.forall(_.getAs[String]("page_url") == "/dashboard"))
  }

  test("parsed fields land typed; missing fields become null") {
    val row = parse(
      s"""{"payload": {"after": "$after", "op": "c", "ts_ms": 1735813800000}}""")
      .collect()(0)
    assert(row.getAs[Int]("employee_id") == 1)
    assert(row.getAs[Int]("duration_seconds") == 45)
    assert(row.getAs[java.sql.Timestamp]("activity_timestamp").toInstant.toString
      == "2025-01-02T10:30:00Z")
    assert(row.getAs[String]("session_id") == null) // absent in payload
  }

  test("malformed after-JSON yields an all-null row (from_json semantics), not a crash") {
    val rows = parse(
      """{"payload": {"after": "{not json", "op": "c", "ts_ms": 1}}""")
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("id") == null)
    assert(rows(0).getAs[Long]("event_timestamp") == 1L)
  }

  test("malformed envelope is dropped by the op filter") {
    assert(parse("""not json at all""").collect().isEmpty)
  }

  test("parseWire (micros wire, default filter): c/u kept with restored timestamps; d and corrupt dropped") {
    // epoch-micros after-payload, the Debezium MicroTimestamp format
    val microsAfter =
      """{\"id\":\"a-1\",\"employee_id\":1,\"activity_type\":\"page_view\",""" +
        """\"activity_timestamp\":1735813800000000,\"created_at\":1735813800000000}"""
    val wire = Seq(
      s"""{"payload": {"after": "$microsAfter", "op": "c", "ts_ms": 1735813800000}}""",
      s"""{"payload": {"after": null, "op": "d", "ts_ms": 2}}""",
      """broken json""").toDF("value")
    val rows = Debezium.parseWire(wire, Schemas.activity).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[java.sql.Timestamp]("activity_timestamp").toInstant.toString
      == "2025-01-02T10:30:00Z")
    assert(rows(0).getAs[Long]("event_timestamp") == 1735813800000L)

    // header-routed variant: same inputs (+ header col) must produce the
    // SAME surviving row — in particular the corrupt value is dropped,
    // not emitted as an all-null row
    val headered = Seq(
      ("c", s"""{"payload": {"after": "$microsAfter", "op": "c", "ts_ms": 1735813800000}}"""),
      ("d", s"""{"payload": {"after": null, "op": "d", "ts_ms": 2}}"""),
      // disagreeing header on a delete (null after): must NOT become an
      // all-null row
      ("c", s"""{"payload": {"after": null, "op": "d", "ts_ms": 3}}"""),
      ("c", """broken json""")).toDF("op_header", "value")
    val viaHeader =
      Debezium.parseWire(headered, Schemas.activity, headerOpCol = Some("op_header")).collect()
    assert(viaHeader.length == 1)
    assert(viaHeader(0).getAs[String]("id") == "a-1")
  }

  test("timestamps round-trip losslessly with micros options") {
    import org.apache.spark.sql.functions._
    val src = Seq(java.sql.Timestamp.valueOf("2024-01-01 00:09:58.778549"))
      .toDF("ts")
    val wire = src.select(to_json(struct(col("ts")), Debezium.microsJsonOptions).as("j"))
    val back = wire.select(
      from_json(col("j"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType))), Debezium.microsJsonOptions)
        .getField("ts").as("ts"))
    assert(back.collect()(0).getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2024-01-01 00:09:58.778549"))
  }
}
