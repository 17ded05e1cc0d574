package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.io.JsonFileSource
import graft.streaming.Pipeline

/** End-to-end streaming smoke: CDC-envelope JSON files → Debezium parse
  * → enrich → upsert-parquet + windowed aggs, via the full Pipeline
  * topology (the offline stand-in for the Kafka-wired deployment).
  * Prints row counts; exits nonzero if any leg produced nothing.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[8]", 8)
    val root = Files.createTempDirectory("graft_stream_demo").toString
    val empDir = s"$root/in_employees"
    val actDir = s"$root/in_activities"
    Files.createDirectories(Paths.get(empDir))
    Files.createDirectories(Paths.get(actDir))

    def envelope(after: String, op: String, tsMs: Long): String =
      s"""{"payload": {"after": "${after.replace("\"", "\\\"")}", "op": "$op", "ts_ms": $tsMs}}"""

    val empLines = (1 to 20).map { i =>
      envelope(
        s"""{"id":$i,"name":"Emp $i","email":"emp$i${if (i % 7 == 0) ".senior" else ""}@corp.com",""" +
          s""""department":"${Seq("Engineering", "Sales", "HR")(i % 3)}","created_at":"2025-01-02T09:00:00Z"}""",
        if (i % 5 == 0) "u" else "c", 1735808400000L + i)
    }
    val actLines = (1 to 200).map { i =>
      val op = i % 10 match { case 0 => "d"; case 1 => "r"; case _ => "c" }
      envelope(
        s"""{"id":"a-$i","employee_id":${i % 20 + 1},"activity_type":"page_view","page_url":"/p/${i % 7}",""" +
          s""""duration_seconds":${i % 400},"activity_timestamp":"2025-01-02T${10 + i % 8}:0${i % 6}:00Z","device_type":"${Seq("mobile", "tablet", "desktop")(i % 3)}"}""",
        op, 1735813800000L + i)
    }
    Files.write(Paths.get(s"$empDir/batch1.jsonl"), String.join("\n", empLines: _*).getBytes)
    Files.write(Paths.get(s"$actDir/batch1.jsonl"), String.join("\n", actLines: _*).getBytes)

    val queries = Pipeline.start(
      JsonFileSource(empDir).load(spark),
      JsonFileSource(actDir).load(spark),
      s"$root/out", s"$root/ckpt")
    try queries.foreach(_.processAllAvailable())
    finally queries.foreach(_.stop())

    val employees = spark.read.parquet(s"$root/out/employees")
    val activities = spark.read.parquet(s"$root/out/activities")
    val hourly = spark.table("hourly_agg")
    val daily = spark.table("daily_agg")
    val nEmp = employees.count()
    val nAct = activities.count()
    val nHourly = hourly.count()
    val nDaily = daily.count()
    println(s"employees upserted: $nEmp (distinct ids: ${employees.select("id").distinct().count()})")
    println(s"activities upserted: $nAct (ops c/u only: expected 160)")
    println(s"hourly agg groups: $nHourly")
    println(s"daily agg groups: $nDaily")
    println("sample hourly: " + hourly.orderBy(desc("activity_count")).limit(1).collect().mkString)
    val ok = nEmp == 20 && nAct == 160 && nHourly > 0 && nDaily > 0
    spark.stop()
    if (!ok) sys.exit(1)
    println("STREAM DEMO OK")
  }
}
