package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, StreamDecon, StreamDedup, Text}

/** Streaming decontamination against a static benchmark corpus:
  * per-micro-batch scoring, anti-join admission, batch-twin parity.
  */
case class DeconDoc(doc_id: Long, text: String)

class StreamDeconSpec extends SparkSpec {
  import spark.implicits._

  // benchmark doc: 12 words → 10 distinct 3-gram shingles
  private val benchText = (1 to 12).map(i => s"b$i").mkString(" ")
  // contaminated: contains an 8-word run of the benchmark → 6 shared shingles
  private val dirtyText =
    "x1 x2 " + (3 to 10).map(i => s"b$i").mkString(" ") + " x3 x4"
  // brushing: a 6-word run → 4 shared shingles, below the threshold of 5
  private val brushText =
    "y1 y2 y3 " + (5 to 10).map(i => s"b$i").mkString(" ") + " y4"
  private val cleanText = (1 to 12).map(i => s"c$i").mkString(" ")

  private def benchDF = Seq(DeconDoc(50, benchText)).toDF()
    .select(explode(Dedup.shingles(Text.tokens(col("text")))).as("s"),
      col("doc_id").as("bench_doc"))

  test("scores counts shared shingles per (train, bench) pair above the threshold") {
    val docs = Seq(DeconDoc(1, dirtyText), DeconDoc(2, brushText), DeconDoc(3, cleanText)).toDF()
    val scored = StreamDecon.scores(docs, benchDF).collect()
    assert(scored.length == 1) // only the dirty doc crosses >= 5
    assert(scored(0).getAs[Long]("train_doc") == 1L)
    assert(scored(0).getAs[Long]("bench_doc") == 50L)
    assert(scored(0).getAs[Long]("n_shared") == 6L)
  }

  test("streaming admission matches the batch twin across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val allDocs = Seq(
      DeconDoc(1, dirtyText), DeconDoc(2, brushText),
      DeconDoc(3, cleanText), DeconDoc(4, dirtyText + " tail"))
    val batchAdmitted = StreamDecon.clean(allDocs.toDF(), benchDF)
      .select("doc_id").as[Long].collect().toSet

    val mem = MemoryStream[DeconDoc]
    val admitted = scala.collection.mutable.Set.empty[Long]
    val checkpoint = java.nio.file.Files.createTempDirectory("decon_ckpt").toString
    val q = StreamDecon.start(mem.toDF(), benchDF, checkpoint) { (clean, _) =>
      admitted ++= clean.select("doc_id").as[Long](implicitly).collect()
    }
    try {
      mem.addData(allDocs(0), allDocs(1)) // batch 0: one dirty, one brushing
      q.processAllAvailable()
      mem.addData(allDocs(2), allDocs(3)) // batch 1: one clean, one dirty
      q.processAllAvailable()
    } finally q.stop()

    assert(admitted.toSet == batchAdmitted)
    assert(admitted.toSet == Set(2L, 3L)) // brushing passes, dirty ones don't
  }

  // ——— StreamDedup: incremental near-dup admission vs a static corpus ———

  // 20-word corpus doc; the near-dup drops the LAST word (17 of 18
  // shingles shared → Jaccard ≈ 0.944, inside the regime where 8×4
  // banding recall is ≈ 1 — a mid-text edit at j≈0.75 can genuinely
  // miss all bands); the fresh doc shares nothing
  private val corpusText = (1 to 20).map(i => s"w$i").mkString(" ")
  private val nearDupText = (1 to 19).map(i => s"w$i").mkString(" ")
  private val freshText = (1 to 20).map(i => s"z$i").mkString(" ")

  test("StreamDedup.matches verifies band candidates with exact Jaccard") {
    val idx = StreamDedup.index(Seq(DeconDoc(100, corpusText)).toDF())
    val batch = Seq(DeconDoc(1, nearDupText), DeconDoc(2, freshText)).toDF()
    val m = StreamDedup.matches(batch, idx).collect()
    assert(m.length == 1)
    assert(m(0).getAs[Long]("doc_id") == 1L)
    assert(m(0).getAs[Long]("corpus_doc") == 100L)
    assert(m(0).getAs[Double]("jaccard") >= 0.6)
  }

  test("StreamDedup streaming admission matches its batch twin across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val idx = StreamDedup.index(Seq(DeconDoc(100, corpusText)).toDF())
    val allDocs = Seq(
      DeconDoc(1, nearDupText), DeconDoc(2, freshText),
      DeconDoc(3, corpusText), DeconDoc(4, freshText + " tail"))
    val batchAdmitted = StreamDedup.clean(allDocs.toDF(), idx)
      .select("doc_id").as[Long].collect().toSet

    val mem = MemoryStream[DeconDoc]
    val admitted = scala.collection.mutable.Set.empty[Long]
    val checkpoint = java.nio.file.Files.createTempDirectory("neardup_ckpt").toString
    val q = StreamDedup.start(mem.toDF(), idx, checkpoint) { (clean, _) =>
      admitted ++= clean.select("doc_id").as[Long](implicitly).collect()
    }
    try {
      mem.addData(allDocs(0), allDocs(1))
      q.processAllAvailable()
      mem.addData(allDocs(2), allDocs(3))
      q.processAllAvailable()
    } finally q.stop()

    assert(admitted.toSet == batchAdmitted)
    assert(admitted.toSet == Set(2L, 4L)) // near-dup and exact copy both rejected
  }
}
