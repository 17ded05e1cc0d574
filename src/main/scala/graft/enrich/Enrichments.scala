package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived-column enrichment stages.
  *
  * Semantics from the reference's `process_employee_data` /
  * `process_activity_data` (spark-streaming/
  * multi_source_streaming_processor.py:127-197). All pure Column
  * expressions (CASE/contains/hour/to_date/lit) — no UDFs, so every rule
  * stays inside whole-stage codegen and pipelines with the scan; this
  * stage adds zero shuffles at any scale.
  *
  * `now` is injectable (defaults to `current_date()`): processing-time
  * columns made the reference untestable; a fixed clock makes golden and
  * oracle tests deterministic (SURVEY §7.4 risk 5).
  */
object Enrichments {

  /** F4 (py:128-131): department → category. */
  def departmentCategory(department: Column): Column =
    when(department.isin("Engineering", "IT"), "Technical")
      .when(department.isin("Sales", "Marketing"), "Business")
      .otherwise("Support")

  /** F5 (py:132-136): email → seniority level; first matching branch wins. */
  def employeeLevel(email: Column): Column =
    when(email.contains("senior"), "Senior")
      .when(email.contains("lead"), "Lead")
      .otherwise("Regular")

  /** F6 (py:179-182): duration thresholds 30 / 300.
    * Null-safe note: a null duration falls through every `when` to
    * "long" — reference behavior, kept (FIXTURES §1.6).
    */
  def sessionDurationCategory(durationSeconds: Column): Column =
    when(durationSeconds < 30, "short")
      .when(durationSeconds < 300, "medium")
      .otherwise("long")

  /** F7 (py:183-187): hour ∈ [9, 17]; null timestamp → false (the
    * reference's when(...).otherwise(False) shape, which never yields
    * null).
    */
  def isBusinessHours(ts: Column): Column =
    coalesce(hour(ts) >= 9 && hour(ts) <= 17, lit(false))

  /** F8 (py:188-192): device_type → category; anything unknown is Desktop. */
  def deviceCategory(deviceType: Column): Column =
    when(deviceType === "mobile", "Mobile")
      .when(deviceType === "tablet", "Tablet")
      .otherwise("Desktop")

  /** Employee enrichment (py:127-141): 4 derived columns. */
  def enrichEmployees(df: DataFrame, now: Column = current_date()): DataFrame =
    df.withColumn("department_category", departmentCategory(col("department")))
      .withColumn("employee_level", employeeLevel(col("email")))
      .withColumn("data_source", lit("postgresql"))
      .withColumn("processing_date", now)

  /** Activity enrichment (py:173-197): 7 derived columns. The downstream
    * aggregations group on `device_category`, so aggs depend on this
    * stage (SURVEY §3.3).
    */
  def enrichActivities(df: DataFrame, now: Column = current_date()): DataFrame =
    df.withColumn("activity_hour", hour(col("activity_timestamp")))
      .withColumn("activity_date", to_date(col("activity_timestamp")))
      .withColumn("session_duration_category", sessionDurationCategory(col("duration_seconds")))
      .withColumn("is_business_hours", isBusinessHours(col("activity_timestamp")))
      .withColumn("device_category", deviceCategory(col("device_type")))
      .withColumn("data_source", lit("postgresql"))
      .withColumn("processing_date", now)
}
