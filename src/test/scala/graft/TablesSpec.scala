package graft

import org.apache.spark.sql.types._

/** Loader contract against the CURRENT driver testdata. The driver
  * regenerates /root/testdata between rounds and has changed physical
  * encodings before (events.ts: int64-nanos → timestamp[us]); this spec
  * makes such a change fail `sbt test` loudly instead of silently
  * dropping every events-derived query from the correctness run.
  */
class TablesSpec extends SparkSpec {

  test("events loads with ts as TimestampType regardless of file encoding") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType === TimestampType)
    val n = ev.filter(col("ts").isNotNull).count()
    assert(n > 0, "events.ts must be non-null after adaptation")
  }

  test("events ts values land in the generator's date range") {
    import org.apache.spark.sql.functions.{max, min}
    val r = Tables.events(spark, sf0001)
      .agg(min("ts").as("lo"), max("ts").as("hi")).head()
    val lo = r.getTimestamp(0).toInstant
    val hi = r.getTimestamp(1).toInstant
    assert(lo.isAfter(java.time.Instant.parse("2000-01-01T00:00:00Z")),
      s"min ts $lo implausibly early — unit mismatch in the ts adaptation?")
    assert(hi.isBefore(java.time.Instant.parse("2100-01-01T00:00:00Z")),
      s"max ts $hi implausibly late — unit mismatch in the ts adaptation?")
  }

  test("activities derives the full mapped schema") {
    val act = Tables.activities(spark, sf0001)
    val expected = Map(
      "id" -> StringType, "employee_id" -> LongType,
      "activity_type" -> StringType, "page_url" -> StringType,
      "duration_seconds" -> IntegerType, "ip_address" -> StringType,
      "user_agent" -> StringType, "activity_timestamp" -> TimestampType,
      "session_id" -> StringType, "device_type" -> StringType,
      "browser" -> StringType, "created_at" -> TimestampType)
    expected.foreach { case (name, dt) =>
      assert(act.schema(name).dataType === dt, s"column $name")
    }
    assert(act.count() > 0)
  }

  test("employees derives id/name/email/department/created_at") {
    val emp = Tables.employees(spark, sf0001)
    assert(emp.schema("id").dataType === LongType)
    assert(emp.schema("created_at").dataType === TimestampType)
    val depts = emp.select("department").distinct().collect().map(_.getString(0)).toSet
    assert(depts.subsetOf(Set("Engineering", "IT", "Sales", "Marketing", "HR")))
    assert(emp.count() > 0)
  }

  private def col(name: String) = org.apache.spark.sql.functions.col(name)
}
