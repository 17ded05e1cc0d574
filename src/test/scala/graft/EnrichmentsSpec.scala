package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.enrich.Enrichments

/** FIXTURES.md §1.6 edge-case matrix for the enrichment CASE rules. */
class EnrichmentsSpec extends SparkSpec {
  import spark.implicits._

  test("session_duration_category thresholds 29/30/299/300 and null") {
    val out = Seq(Some(29), Some(30), Some(299), Some(300), None)
      .toDF("duration_seconds")
      .select(Enrichments.sessionDurationCategory(col("duration_seconds")).as("c"))
      .as[String].collect()
    // null falls through every `when` to "long" — reference behavior
    assert(out.toSeq == Seq("short", "medium", "medium", "long", "long"))
  }

  test("is_business_hours boundaries 8/9/17/18; null timestamp -> false") {
    val out = Seq(8, 9, 17, 18)
      .map(h => Timestamp.valueOf(f"2025-01-02 $h%02d:30:00"))
      .toDF("ts")
      .select(Enrichments.isBusinessHours(col("ts")).as("b"))
      .as[Boolean].collect()
    assert(out.toSeq == Seq(false, true, true, false))
    val nullOut = Seq(Option.empty[Timestamp]).toDF("ts")
      .select(Enrichments.isBusinessHours(col("ts")).as("b")).collect()(0)
    assert(!nullOut.isNullAt(0) && !nullOut.getBoolean(0)) // false, not null
  }

  test("device_category mapping incl. unknown and null → Desktop") {
    val out = Seq(Some("mobile"), Some("tablet"), Some("desktop"), Some("smart-tv"), None)
      .toDF("device_type")
      .select(Enrichments.deviceCategory(col("device_type")).as("c"))
      .as[String].collect()
    assert(out.toSeq == Seq("Mobile", "Tablet", "Desktop", "Desktop", "Desktop"))
  }

  test("department_category mapping") {
    val out = Seq("Engineering", "IT", "Sales", "Marketing", "HR")
      .toDF("department")
      .select(Enrichments.departmentCategory(col("department")).as("c"))
      .as[String].collect()
    assert(out.toSeq == Seq("Technical", "Technical", "Business", "Business", "Support"))
  }

  test("employee_level: first matching branch wins (senior+lead → Senior)") {
    val out = Seq("a.senior.lead@x.com", "b.lead@x.com", "c@x.com")
      .toDF("email")
      .select(Enrichments.employeeLevel(col("email")).as("l"))
      .as[String].collect()
    assert(out.toSeq == Seq("Senior", "Lead", "Regular"))
  }

  test("activity enrichment emits all 7 derived columns with pinned clock") {
    val df = Seq((Timestamp.valueOf("2025-01-02 10:30:00"), Some(45), "mobile"))
      .toDF("activity_timestamp", "duration_seconds", "device_type")
    val row = Enrichments.enrichActivities(df, lit("2024-02-01").cast("date")).collect()(0)
    assert(row.getAs[Int]("activity_hour") == 10)
    assert(row.getAs[java.sql.Date]("activity_date").toString == "2025-01-02")
    assert(row.getAs[String]("session_duration_category") == "medium")
    assert(row.getAs[Boolean]("is_business_hours"))
    assert(row.getAs[String]("device_category") == "Mobile")
    assert(row.getAs[String]("data_source") == "postgresql")
    assert(row.getAs[java.sql.Date]("processing_date").toString == "2024-02-01")
  }
}
