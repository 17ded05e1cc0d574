package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.ParquetUpsertSink

/** RESTORE TABLE ... VERSION AS OF semantics of the graft-upsert
  * table format (`ParquetUpsertSink.restoreTo` + the
  * `CALL graft.system.restore` surface) — the Delta RESTORE / Hudi
  * rollback analog.
  *
  * Contract under test: restore lands the live table on the exact
  * as-of state, as a NEW commit (history keeps the pre-restore head,
  * so the restore is itself time-travelable and reversible); the I/O
  * is proportional to the partitions changed since the target commit
  * (untouched partitions are not rewritten); partitions created after
  * the target restore to absence; the retention fail-fast guards a
  * pruned target.
  */
class RestoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def rows(dir: String): Set[(Long, Long, String, Double)] =
    spark.read.format("graft-upsert").load(dir)
      .select(col("id"), col("seq"), col("p"), col("v"))
      .as[(Long, Long, String, Double)].collect().toSet

  test("restore undoes later commits exactly; created partitions delete") {
    val dir = tmp("restore")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p", keepVersions = 5)
    sink.upsert(Seq((1L, 0L, "a", 10.0), (2L, 0L, "b", 20.0))
      .toDF("id", "seq", "p", "v"), 0)
    Thread.sleep(5)
    // commit 1: update partition a, CREATE partition c
    sink.upsert(Seq((1L, 1L, "a", 11.0), (3L, 1L, "c", 30.0))
      .toDF("id", "seq", "p", "v"), 1)
    Thread.sleep(5)
    // commit 2: update partition b
    sink.upsert(Seq((2L, 2L, "b", 22.0)).toDF("id", "seq", "p", "v"), 2)
    val commits = ParquetUpsertSink.listArchivedCommits(spark, dir)
    val expected = sink.readAsOf(spark, commits(0))
      .select(col("id"), col("seq"), col("p"), col("v"))
      .as[(Long, Long, String, Double)].collect().toSet

    val restored = sink.restoreTo(spark, commits(0))
    // exactly the partitions commits 1–2 touched, escaped dir values
    assert(restored.toSet == Set("a", "b", "c"))
    assert(rows(dir) == expected)
    assert(rows(dir) == Set((1L, 0L, "a", 10.0), (2L, 0L, "b", 20.0)))
    // partition c was created after the target: its directory is gone
    assert(!new java.io.File(dir, "p=c").exists())
  }

  test("restore rewrites ONLY the changed partitions (change-set-proportional)") {
    val dir = tmp("restorecsp")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p", keepVersions = 5)
    sink.upsert(Seq((1L, 0L, "a", 10.0), (2L, 0L, "b", 20.0), (3L, 0L, "c", 30.0))
      .toDF("id", "seq", "p", "v"), 0)
    Thread.sleep(5)
    sink.upsert(Seq((1L, 1L, "a", 11.0)).toDF("id", "seq", "p", "v"), 1)
    val commits = ParquetUpsertSink.listArchivedCommits(spark, dir)
    def filesOf(p: String): Set[String] =
      new java.io.File(dir, s"p=$p").listFiles()
        .filter(_.getName.startsWith("part-")).map(_.getName).toSet
    val bBefore = filesOf("b")
    val cBefore = filesOf("c")

    val restored = sink.restoreTo(spark, commits(0))
    assert(restored.toSet == Set("a"))
    // untouched partitions keep their exact physical files — at 100 TB
    // this is the difference between a restore and a table rewrite
    assert(filesOf("b") == bBefore && filesOf("c") == cBefore)
    assert(rows(dir) == Set((1L, 0L, "a", 10.0), (2L, 0L, "b", 20.0),
      (3L, 0L, "c", 30.0)))
  }

  test("restore is a NEW commit: the pre-restore head stays time-travelable") {
    val dir = tmp("restorehist")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p", keepVersions = 6)
    sink.upsert(Seq((1L, 0L, "a", 10.0)).toDF("id", "seq", "p", "v"), 0)
    Thread.sleep(5)
    sink.upsert(Seq((1L, 1L, "a", 99.0)).toDF("id", "seq", "p", "v"), 1) // bad wave
    val pre = ParquetUpsertSink.listArchivedCommits(spark, dir)
    sink.restoreTo(spark, pre(0))
    val post = ParquetUpsertSink.listArchivedCommits(spark, dir)
    assert(post.size == pre.size + 1, "restore must append a commit, not rewind")
    // live = restored state; VERSION AS OF the bad head still serves it
    assert(rows(dir) == Set((1L, 0L, "a", 10.0)))
    assert(sink.readAsOf(spark, pre.last).select("id", "seq", "p", "v")
      .as[(Long, Long, String, Double)].collect().toSet ==
      Set((1L, 1L, "a", 99.0)))
    // the change feed across the restore commit records the undo
    val feed = sink.changeFeed(spark, pre.last, post.last)
      .select("id", "v", "_change_type")
      .as[(Long, Double, String)].collect().toSet
    assert(feed == Set((1L, 99.0, "update_preimage"), (1L, 10.0, "update_postimage")))
    // and restoring FORWARD to the bad head works (reversibility)
    sink.restoreTo(spark, pre.last)
    assert(rows(dir) == Set((1L, 1L, "a", 99.0)))
  }

  test("restore to the newest commit is a no-op; pruned target fails fast") {
    val dir = tmp("restorenoop")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p", keepVersions = 2)
    sink.upsert(Seq((1L, 0L, "a", 10.0)).toDF("id", "seq", "p", "v"), 0)
    Thread.sleep(5)
    sink.upsert(Seq((1L, 1L, "a", 11.0)).toDF("id", "seq", "p", "v"), 1)
    val commits = ParquetUpsertSink.listArchivedCommits(spark, dir)
    assert(sink.restoreTo(spark, commits.last).isEmpty)
    assert(rows(dir) == Set((1L, 1L, "a", 11.0)))
    // keepVersions=2 retains one commit: commit 0's pre-image is pruned
    val e = intercept[IllegalArgumentException](sink.restoreTo(spark, "not-a-commit"))
    assert(e.getMessage.contains("not retained"))
  }

  test("restore across a RENAME lands under the current column names") {
    val dir = tmp("restoreren")
    val t = s"graft.`$dir`"
    spark.sql(
      s"""CREATE TABLE $t (id BIGINT, seq BIGINT, p STRING, amount DOUBLE)
         |PARTITIONED BY (p)
         |TBLPROPERTIES ('recordKeys'='id', 'precombine'='seq', 'keepVersions'='6')
         |""".stripMargin)
    spark.sql(s"INSERT INTO $t VALUES (1, 0, 'a', 10.0)")
    Thread.sleep(5)
    spark.sql(s"INSERT INTO $t VALUES (1, 1, 'a', 99.0)")
    val commits = ParquetUpsertSink.listArchivedCommits(spark, dir)
    spark.sql(s"ALTER TABLE $t RENAME COLUMN amount TO price")
    // restore to the pre-rename commit 0 state: archived files store
    // `amount`; the restored live files must store `price`
    val out = spark.sql(s"CALL graft.system.restore('$dir', '${commits(0)}')")
    assert(out.as[String].collect().toSeq == Seq("a"))
    assert(spark.sql(s"SELECT id, price FROM $t")
      .as[(Long, Double)].collect().toSeq == Seq((1L, 10.0)))
    val f = new java.io.File(dir, "p=a").listFiles()
      .filter(_.getName.startsWith("part-")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toString),
        spark.sparkContext.hadoopConfiguration))
    val names = try {
      import scala.collection.JavaConverters._
      reader.getFooter.getFileMetaData.getSchema.getFields.asScala
        .map(_.getName).toSet
    } finally reader.close()
    assert(names.contains("price") && !names.contains("amount"))
  }

  test("restore covers the null partition (Hive default-partition dir)") {
    val dir = tmp("restorenull")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p", keepVersions = 5)
    sink.upsert(Seq((1L, 0L, null.asInstanceOf[String], 10.0),
      (2L, 0L, "a", 20.0)).toDF("id", "seq", "p", "v"), 0)
    Thread.sleep(5)
    sink.upsert(Seq((1L, 1L, null.asInstanceOf[String], 99.0))
      .toDF("id", "seq", "p", "v"), 1)
    val commits = ParquetUpsertSink.listArchivedCommits(spark, dir)
    val restored = sink.restoreTo(spark, commits(0))
    assert(restored.toSet == Set("__HIVE_DEFAULT_PARTITION__"))
    assert(spark.read.format("graft-upsert").load(dir)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 20.0)))
  }

  test("restore fails fast across a legacy commit lacking _touched.manifest") {
    val dir = tmp("restorelegacy")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p", keepVersions = 5)
    sink.upsert(Seq((1L, 0L, "a", 10.0)).toDF("id", "seq", "p", "v"), 0)
    Thread.sleep(5)
    sink.upsert(Seq((1L, 1L, "a", 11.0), (2L, 1L, "c", 30.0))
      .toDF("id", "seq", "p", "v"), 1)
    val commits = ParquetUpsertSink.listArchivedCommits(spark, dir)
    assert(commits.size == 2)
    // forge a pre-manifest commit: without its touched set, "created
    // by this commit" (partition c must restore to ABSENCE) is
    // indistinguishable from "untouched" — committing that guess
    // could silently keep partitions the as-of state never had
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dir/_archive/${commits(1)}/${ParquetUpsertSink.TouchedManifest}"), false)
    val err = intercept[IllegalArgumentException](
      sink.restoreTo(spark, commits(0)))
    assert(err.getMessage.contains("predate the touched-partition manifest"))
    // the failed restore mutated NOTHING
    assert(rows(dir) == Set((1L, 1L, "a", 11.0), (2L, 1L, "c", 30.0)))
    // a target at-or-after the legacy commit still restores fine
    assert(sink.restoreTo(spark, commits(1)).isEmpty) // already there: no-op
  }

  test("restore refuses a MOR table with unmerged deltas") {
    val dir = tmp("restoremor")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p", keepVersions = 5,
      writeMode = ParquetUpsertSink.ModeMor)
    sink.upsert(Seq((1L, 0L, "a", 10.0)).toDF("id", "seq", "p", "v"), 0)
    Thread.sleep(5)
    sink.upsert(Seq((1L, 1L, "a", 11.0)).toDF("id", "seq", "p", "v"), 1)
    val commits = ParquetUpsertSink.listArchivedCommits(spark, dir)
    if (ParquetUpsertSink.listDeltaCommits(spark, dir).nonEmpty) {
      val e = intercept[IllegalArgumentException](
        sink.restoreTo(spark, commits.headOption.getOrElse("")))
      assert(e.getMessage.contains("delta"))
    } else cancel("MOR table inline-compacted; no live delta to gate on")
  }
}
