package graft

import java.nio.file.Files

import graft.io.ParquetUpsertSink

/** CREATE TABLE AS SELECT / REPLACE TABLE AS SELECT through the graft
  * catalog — Spark's non-atomic v2 CTAS path (create, then write) over
  * [[graft.io.GraftUpsertCatalog]] + the upsert table's append-as-
  * upsert write. The assertions pin the surface: rows land partitioned
  * with the declared table properties, RTAS replaces CONTENT while the
  * commit machinery (archive, time travel) keeps working, and a failed
  * CTAS does not leave a half-created table behind Spark's cleanup.
  */
class CtasSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  test("CTAS creates, partitions, and loads in one statement") {
    val dir = tmp("ctas")
    spark.sql(
      s"""CREATE TABLE graft.`$dir`
         |PARTITIONED BY (p)
         |TBLPROPERTIES ('recordKeys'='id', 'precombine'='seq')
         |AS SELECT id, CAST(0 AS BIGINT) AS seq, CAST(id % 3 AS STRING) AS p
         |FROM range(10)
         |""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`").head().getLong(0) == 10L)
    // physically partitioned, properties persisted (writes are option-less)
    assert((0 to 2).forall(i => new java.io.File(dir, s"p=$i").isDirectory))
    assert(graft.io.GraftUpsertCatalog.tableProps(dir).get("recordKeys").contains("id"))
    // and the table behaves as an upsert table from here on
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 1, '1')")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`").head().getLong(0) == 10L)
    assert(spark.sql(s"SELECT p FROM graft.`$dir` WHERE id = 1").as[String]
      .collect().toSeq == Seq("1")) // precombined update moved the row
  }

  test("RTAS replaces content; the replace is a commit like any other") {
    val dir = tmp("rtas")
    spark.sql(
      s"""CREATE TABLE graft.`$dir` (id BIGINT, seq BIGINT, p STRING)
         |PARTITIONED BY (p)
         |TBLPROPERTIES ('recordKeys'='id', 'precombine'='seq', 'keepVersions'='5')
         |""".stripMargin)
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 0, 'a')")
    spark.sql(
      s"""REPLACE TABLE graft.`$dir`
         |PARTITIONED BY (p)
         |TBLPROPERTIES ('recordKeys'='id', 'precombine'='seq', 'keepVersions'='5')
         |AS SELECT id + 100 AS id, CAST(0 AS BIGINT) AS seq,
         |          CAST(id % 2 AS STRING) AS p FROM range(4)
         |""".stripMargin)
    assert(spark.sql(s"SELECT min(id), count(*) FROM graft.`$dir`")
      .as[(Long, Long)].head() == ((100L, 4L)))
    assert(!spark.sql(s"SELECT p FROM graft.`$dir`").as[String]
      .collect().contains("a"))
  }

  test("CTAS into an existing table fails; IF NOT EXISTS no-ops") {
    val dir = tmp("ctasex")
    spark.sql(
      s"""CREATE TABLE graft.`$dir` (id BIGINT, seq BIGINT, p STRING)
         |PARTITIONED BY (p)
         |TBLPROPERTIES ('recordKeys'='id', 'precombine'='seq')
         |""".stripMargin)
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (7, 0, 'a')")
    intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.`$dir` PARTITIONED BY (p)
         |TBLPROPERTIES ('recordKeys'='id', 'precombine'='seq')
         |AS SELECT 1L AS id, 0L AS seq, 'x' AS p""".stripMargin))
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS graft.`$dir` PARTITIONED BY (p)
         |TBLPROPERTIES ('recordKeys'='id', 'precombine'='seq')
         |AS SELECT 1L AS id, 0L AS seq, 'x' AS p""".stripMargin)
    // the original row survived both attempts
    assert(spark.sql(s"SELECT id FROM graft.`$dir`").as[Long]
      .collect().toSeq == Seq(7L))
  }
}
