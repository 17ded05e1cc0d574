package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.{CorpusIngest, StreamDedup}

/** End-to-end streaming corpus ingest: quality gate → near-dup
  * admission → redaction/accounting → keyed upsert, and its parity
  * with the batch twin.
  */
case class IngestDoc(doc_id: Long, text: String, lang: String)

class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  // corpus doc (already ingested); the near-dup drops the last word
  private val corpusText = (1 to 20).map(i => s"w$i").mkString(" ")
  private val nearDupText = (1 to 19).map(i => s"w$i").mkString(" ")
  // high-quality fresh doc (all-distinct tokens → ttr 1.0) with
  // embedded digit runs for the redaction stage
  private val freshText = (1 to 20).map(i => s"f${i}a${i * 7}").mkString(" ")
  // token salad: 4 distinct tokens over 20 → quality ≈ 0.2 < 0.5
  private val junkText = Seq.fill(5)("a b c d").mkString(" ")

  private def idx = StreamDedup.index(
    Seq(IngestDoc(100, corpusText, "en")).toDF())

  test("the batch path composes the quality gate, dedup admission, and redaction") {
    val docs = Seq(
      IngestDoc(1, nearDupText, "en"),
      IngestDoc(2, freshText, "en"),
      IngestDoc(3, junkText, "de")).toDF()
    val out = CorpusIngest.cleanBatch(docs, idx).collect()
    // near-dup rejected by the index probe, junk by the quality gate
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(2L))
    val r = out(0)
    assert(r.getAs[Double]("quality") >= CorpusIngest.qualityMin)
    // digits were redacted before fingerprinting
    val expectedClean = freshText.replaceAll("[0-9]+", "<NUM>")
    val expectedFp = java.security.MessageDigest.getInstance("MD5")
      .digest(expectedClean.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("clean_fp") == expectedFp)
    assert(r.getAs[Long]("bpe_tokens") > 0L)
  }

  test("streaming ingest matches the batch twin and replays idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val allDocs = Seq(
      IngestDoc(1, nearDupText, "en"), IngestDoc(2, freshText, "en"),
      IngestDoc(3, junkText, "de"), IngestDoc(4, freshText + " tail x", "fr"))
    val expected = CorpusIngest.cleanBatch(allDocs.toDF(), idx)
      .select("doc_id").as[Long].collect().toSet

    val dir = java.nio.file.Files.createTempDirectory("ingest").toString + "/t"
    val checkpoint = java.nio.file.Files.createTempDirectory("ingest_ckpt").toString
    val mem = MemoryStream[IngestDoc]
    val q = CorpusIngest.start(mem.toDF(), idx, dir, checkpoint)
    try {
      mem.addData(allDocs(0), allDocs(1))
      q.processAllAvailable()
      mem.addData(allDocs(2), allDocs(3))
      q.processAllAvailable()
    } finally q.stop()

    val sink = CorpusIngest.sink(dir)
    // live table read: archive dirs are `_`-prefixed and invisible
    def table = spark.read.parquet(dir)
    assert(table.select("doc_id").as[Long].collect().toSet == expected)
    assert(expected == Set(2L, 4L))

    // at-least-once replay: re-upserting batch 1's rows with the same
    // sequence converges to the same table (precombine keeps one row
    // per key)
    val replay = CorpusIngest.cleanBatch(allDocs.drop(2).toDF(), idx)
      .withColumn("seq", lit(1L))
    sink.upsert(replay, 1L)
    assert(table.select("doc_id").as[Long].collect().toSet == expected)
    assert(table.count() == expected.size)
  }
}
