package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.ParquetUpsertSink

/** Single-writer commit fence: interleaved writers fail loudly instead
  * of last-writer-winning, crashed writers' orphan locks break after
  * the staleness timeout, and the fence is reentrant for inline
  * maintenance.
  */
class CommitLockSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeLock(dir: String, token: String, since: Long): Unit = {
    val fs = fsOf(dir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}"), true)
    try out.write(s"$token $since".getBytes("UTF-8")) finally out.close()
  }

  test("a second writer fails loudly while the lock is held — no lost commit") {
    val dir = tmp("lockheld")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept")
    sink.upsert(Seq((1L, 1L, "a")).toDF("id", "seq", "dept"), 0)
    // another driver's live lock
    writeLock(dir, "otherwriter", System.currentTimeMillis())
    val e = intercept[java.util.ConcurrentModificationException] {
      sink.upsert(Seq((2L, 1L, "a")).toDF("id", "seq", "dept"), 1)
    }
    assert(e.getMessage.contains("otherwriter"))
    // the table still holds exactly the committed state
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSeq == Seq(1L))
    // holder releases -> the writer proceeds
    fsOf(dir).delete(new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}"), false)
    sink.upsert(Seq((2L, 1L, "a")).toDF("id", "seq", "dept"), 1)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("a stale lock (crashed writer) is broken and the commit proceeds") {
    val dir = tmp("lockstale")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept")
    writeLock(dir, "deadwriter",
      System.currentTimeMillis() - ParquetUpsertSink.LockTimeoutMs - 1000)
    sink.upsert(Seq((1L, 1L, "a")).toDF("id", "seq", "dept"), 0)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSeq == Seq(1L))
    // and the fence released cleanly after the commit
    assert(!fsOf(dir).exists(new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}")))
  }

  test("the fence is reentrant: inline compaction runs inside the upsert's lock") {
    val dir = tmp("lockreent")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept", compactEvery = 1)
    sink.upsert(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "seq", "dept"), 0)
    assert(spark.read.parquet(dir).count() == 2)
    assert(!fsOf(dir).exists(new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}")))
  }

  test("delete and maintenance honor the fence too") {
    val dir = tmp("lockdel")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept")
    sink.upsert(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "seq", "dept"), 0)
    writeLock(dir, "otherwriter", System.currentTimeMillis())
    intercept[java.util.ConcurrentModificationException] {
      sink.delete(spark, col("id") === 1L)
    }
    intercept[java.util.ConcurrentModificationException] {
      sink.compactPartitions(spark)
    }
    fsOf(dir).delete(new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}"), false)
    assert(sink.delete(spark, col("id") === 1L) == Seq("a"))
  }
}
