package graft.model

import org.apache.spark.sql.types._

/** Data model of the engine — declared, fixed schemas.
  *
  * Mirrors the reference's `define_schemas()`
  * (reference: spark-streaming/multi_source_streaming_processor.py:49-74):
  * nothing is inferred; JSON payloads are parsed against these
  * `StructType`s with `from_json`, so absent/mistyped fields become null.
  */
object Schemas {

  /** Employee row (multi_source_streaming_processor.py:51-57). */
  val employee: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("email", StringType),
    StructField("department", StringType),
    StructField("created_at", TimestampType)
  ))

  /** Activity row (multi_source_streaming_processor.py:59-72).
    * `id` is a string because the nominal Cassandra source uses UUIDs.
    */
  val activity: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("employee_id", IntegerType),
    StructField("activity_type", StringType),
    StructField("page_url", StringType),
    StructField("duration_seconds", IntegerType),
    StructField("ip_address", StringType),
    StructField("user_agent", StringType),
    StructField("activity_timestamp", TimestampType),
    StructField("session_id", StringType),
    StructField("device_type", StringType),
    StructField("browser", StringType),
    StructField("created_at", TimestampType)
  ))

  /** Debezium CDC envelope (multi_source_streaming_processor.py:107-113).
    *
    * `after` is deliberately a STRING — the reference does a two-phase
    * parse (envelope first, then the row JSON inside `after` against the
    * row schema). We reproduce that exactly; it keeps the envelope schema
    * row-type-agnostic so one parser serves every table.
    */
  val cdcEnvelope: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("after", StringType),
      StructField("op", StringType),
      StructField("ts_ms", LongType)
    )))
  ))
}

/** Typed twins of the declared schemas, for Dataset[T] at API
  * boundaries. Field order matches the StructTypes above.
  */
case class Employee(
    id: Option[Int],
    name: Option[String],
    email: Option[String],
    department: Option[String],
    created_at: Option[java.sql.Timestamp])

case class Activity(
    id: Option[String],
    employee_id: Option[Int],
    activity_type: Option[String],
    page_url: Option[String],
    duration_seconds: Option[Int],
    ip_address: Option[String],
    user_agent: Option[String],
    activity_timestamp: Option[java.sql.Timestamp],
    session_id: Option[String],
    device_type: Option[String],
    browser: Option[String],
    created_at: Option[java.sql.Timestamp])

case class CdcPayload(after: Option[String], op: Option[String], ts_ms: Option[Long])
case class CdcEnvelope(payload: Option[CdcPayload])
