package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming filter funnel: incremental report ≡ the batch funnel over
  * the union of everything ingested, and replay changes nothing.
  */
case class FunnelDoc(doc_id: Long, text: String, lang: String, n_chars: Long)

class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String, lang: String = "en") =
    FunnelDoc(id, text, lang, text.length.toLong)

  // good: 30 distinct words → ~130 chars, quality ≥ 0.5, and 29
  // distinct bigrams so top_bigram_frac = 1/29 ≈ 0.034 ≤ 0.05 (20
  // tokens would give 1/19 ≈ 0.053 > 0.05 — flagged repetitive)
  private val good = (1 to 30).map(i => s"ab$i").mkString(" ")
  private val good2 = (31 to 60).map(i => s"cd$i").mkString(" ")
  // junk: 4 distinct tokens repeated → distinct_token_frac < 0.5
  private val junk = Seq.fill(14)("a b c d").mkString(" ")

  private val batch1 = Seq(
    doc(1, good), // keeper of `good`
    doc(2, good2),
    doc(3, junk), // fails repetition
    doc(4, "tiny", "en"), // fails length
    doc(5, good, "zz")) // unknown lang
  private val batch2 = Seq(
    doc(6, good), // exact dup of doc 1 — not a keeper
    doc(7, good2 + " extra"), // near-dup but distinct content key: keeper
    doc(8, good, "de")) // same text, different lang — dup by content key

  test("streaming funnel report matches the batch funnel and replays idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    val checkpoint = java.nio.file.Files.createTempDirectory("funnel_ckpt").toString
    val mem = MemoryStream[FunnelDoc]
    val q = ext.StreamFunnel.start(mem.toDF(), dir, checkpoint)
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, Long)] =
      df.select(col("stage_idx"), col("stage"), col("n_docs"))
        .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)

    val streamed = rows(ext.StreamFunnel.report(spark, dir))
    // keys arrive in doc_id order, so first-arrival keepers == batch
    // min-doc_id keepers and the two definitions coincide
    val expected = rows(ext.Prep.funnelReport(
      ext.Prep.funnelCounts((batch1 ++ batch2).toDF())))
    assert(streamed === expected)
    assert(streamed.head._3 === 8L) // all docs counted, duplicates included
    val n5 = streamed.last._3
    // keepers passing every stage: doc 1 (good), doc 2 (good2), doc 7
    assert(n5 === 3L)

    // replaying the last batch with overwrite semantics changes nothing
    ext.StreamFunnel.ingestBatch(batch2.toDF(), dir, 1L)
    assert(rows(ext.StreamFunnel.report(spark, dir)) === expected)
  }
}
