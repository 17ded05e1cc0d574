package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, StreamDecon, Text}

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
}
