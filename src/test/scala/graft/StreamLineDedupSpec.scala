package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming line-level dedup: accumulated cleaned output ≡ the batch
  * operator over everything ingested (doc_id-ordered waves), replay
  * changes nothing, compaction bounds the registry without changing
  * results.
  */
case class LineDoc(doc_id: Long, text: String)

class StreamLineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def line(p: String) = (1 to 12).map(i => s"$p$i").mkString(" ")
  private val (la, lb, lc, ld, le) =
    (line("a"), line("b"), line("c"), line("d"), line("e"))

  // waves in doc_id order so online keep-first == batch keep-first
  private val wave1 = Seq(
    LineDoc(0, s"$la $lb"),  // registers la, lb
    LineDoc(1, s"$la $lc"))  // loses la within the wave
  private val wave2 = Seq(
    LineDoc(2, s"$lb $ld"),  // loses lb to wave 1
    LineDoc(3, s"$ld $ld"))  // loses 2nd ld (intra-doc) AND 1st to doc 2
  private val wave3 = Seq(
    LineDoc(4, la),          // whole doc already registered: emptied
    LineDoc(5, le))          // novel, untouched

  private def batchExpected: Seq[(Long, Int, Int, String)] = {
    val dir = java.nio.file.Files.createTempDirectory("linebatch").toString
    (wave1 ++ wave2 ++ wave3).toDF()
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    ext.Dedup.lineDedup(spark, dir).as[(Long, Int, Int, String)].collect().toSeq
  }

  test("streamed cleaning equals the batch operator and replays idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("linestream").toString
    val checkpoint = java.nio.file.Files.createTempDirectory("linestream_ckpt").toString
    val mem = MemoryStream[LineDoc]
    val q = ext.StreamLineDedup.start(mem.toDF(), dir, checkpoint)
    try {
      Seq(wave1, wave2, wave3).foreach { w =>
        mem.addData(w: _*); q.processAllAvailable()
      }
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Int, String)].collect().toSeq.sortBy(_._1)

    val streamed = rows(ext.StreamLineDedup.cleaned(spark, dir))
    assert(streamed == batchExpected.sortBy(_._1))
    // spot-check the cross-wave semantics
    val byId = streamed.map(r => r._1 -> r).toMap
    assert(byId(2L)._4 == ld)  // lb cut (registered by wave 1)
    assert(byId(3L)._4 == "")  // both ld occurrences cut (doc 2 keeps it)
    assert(byId(4L)._4 == "")  // whole-doc duplicate emptied
    assert(byId(5L)._4 == le)  // novel doc untouched

    // at-least-once replay of the final wave rewrites its delta
    // byte-identically
    ext.StreamLineDedup.ingestBatch(wave3.toDF(), dir, 2L)
    assert(rows(ext.StreamLineDedup.cleaned(spark, dir)) == streamed)
  }

  test("batch-0 guard catches a previous run's COMPACTED registry") {
    // a dead run whose deltas were folded leaves lines/base_N and an
    // out/ holding only b0 — the old out-only probe let that dead
    // registry pollute the new run (fresh lines wrongly cut as known)
    val dir = java.nio.file.Files.createTempDirectory("sld_stale").toString
    assert(new java.io.File(s"$dir/lines/base_1").mkdirs())
    assert(new java.io.File(s"$dir/out/b0").mkdirs())
    val batch = Seq((1L, "a line")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      ext.StreamLineDedup.ingestBatch(batch, dir, batchId = 0L)
    }
    assert(e.getMessage.contains("fresh checkpoint"))
  }

  test("registry compaction bounds state and leaves cleaning unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("linecomp").toString
    ext.StreamLineDedup.ingestBatch(wave1.toDF(), dir, 0L)
    ext.StreamLineDedup.ingestBatch(wave2.toDF(), dir, 1L)
    ext.StreamLineDedup.compactLines(spark, dir, 1L)
    // delta dirs folded into one base
    val lineDirs = Option(new java.io.File(s"$dir/lines").list())
      .getOrElse(Array.empty[String]).toSeq.sorted
    assert(lineDirs == Seq("base_1"))
    // a crash window that re-runs the fold is a no-op
    ext.StreamLineDedup.compactLines(spark, dir, 1L)
    // wave 3 cleans against the folded registry identically
    ext.StreamLineDedup.ingestBatch(wave3.toDF(), dir, 2L)
    val streamed = ext.StreamLineDedup.cleaned(spark, dir)
      .as[(Long, Int, Int, String)].collect().toSeq.sortBy(_._1)
    assert(streamed == batchExpected.sortBy(_._1))
  }
}
