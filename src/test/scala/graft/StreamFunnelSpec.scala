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

  private def reportRows(dir: String): Seq[(Int, String, Long)] =
    ext.StreamFunnel.report(spark, dir)
      .select(col("stage_idx"), col("stage"), col("n_docs"))
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)

  private def keyDirs(dir: String): Seq[String] =
    Option(new java.io.File(s"$dir/keys").list()).getOrElse(Array.empty).toSeq.sorted

  test("keys compaction bounds state across replayed batches; report unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("funnel_cmp").toString
    // the SAME content re-ingested every batch — the worst case for
    // state growth (every batch writes a full key delta)
    (0L to 5L).foreach(b => ext.StreamFunnel.ingestBatch(batch1.toDF(), dir, b))
    assert(keyDirs(dir).size === 6)
    val before = reportRows(dir)
    ext.StreamFunnel.compactKeys(spark, dir, upToBatch = 5L)
    // six deltas collapsed to ONE base dir holding one row per key
    assert(keyDirs(dir) === Seq("base_5"))
    val nKeys = spark.read.parquet(s"$dir/keys/base_5").count()
    assert(nKeys === batch1.map(_.text).distinct.size)
    assert(reportRows(dir) === before, "compaction must not change the report")

    // a post-compaction replay of an already-folded batch is absorbed
    ext.StreamFunnel.ingestBatch(batch1.toDF(), dir, 3L)
    assert(reportRows(dir) === before)
    // a crashed compaction replay (base committed, deltas back on
    // disk) must clean up, not re-fold into its own input
    ext.StreamFunnel.compactKeys(spark, dir, upToBatch = 5L)
    assert(keyDirs(dir) === Seq("base_5"))
    assert(reportRows(dir) === before)

    // new data after compaction folds base + fresh deltas on the next
    // compaction cycle
    ext.StreamFunnel.ingestBatch(batch2.toDF(), dir, 6L)
    val withNew = reportRows(dir)
    ext.StreamFunnel.compactKeys(spark, dir, upToBatch = 6L)
    assert(keyDirs(dir) === Seq("base_6"))
    assert(reportRows(dir) === withNew)
  }

  test("compactEvery in start() keeps the delta count bounded") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("funnel_auto").toString
    val checkpoint = java.nio.file.Files.createTempDirectory("funnel_auto_ckpt").toString
    val mem = MemoryStream[FunnelDoc]
    val q = ext.StreamFunnel.start(mem.toDF(), dir, checkpoint, compactEvery = 2)
    try {
      (1 to 6).foreach { i =>
        mem.addData(batch1: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // 6 batches, compacted every 2nd: at most 1 base + 1 fresh delta
    assert(keyDirs(dir).size <= 2,
      s"state must stay bounded, saw ${keyDirs(dir)}")
    assert(reportRows(dir).head._3 === 6L * batch1.size)
  }

  test("TTL expires old first-arrivals; a re-arrival counts as a fresh keeper") {
    val dir = java.nio.file.Files.createTempDirectory("funnel_ttl").toString
    ext.StreamFunnel.ingestBatch(batch1.toDF(), dir, 0L)
    ext.StreamFunnel.ingestBatch(batch2.toDF(), dir, 5L)
    // horizon of 2 batches behind 5: batch-0 first-arrivals expire
    ext.StreamFunnel.compactKeys(spark, dir, upToBatch = 5L, ttlBatches = Some(2L))
    val kept = spark.read.parquet(s"$dir/keys/base_5")
      .select(col("bid")).as[Long].collect()
    assert(kept.nonEmpty && kept.forall(_ > 3L),
      "only in-horizon first-arrivals survive")
    // `good` expired with batch 0 — its re-arrival now earns keeper
    // status again (bounded-horizon semantics)
    ext.StreamFunnel.ingestBatch(Seq(doc(20, good)).toDF(), dir, 6L)
    val n5 = reportRows(dir).last._3
    // in-horizon keepers: doc 7 (good2+extra, bid 5) and doc 20's fresh
    // `good` arrival; `good2` (bid 0) expired and did not re-arrive
    assert(n5 === 2L)
  }

  test("report is all zeros over uncommitted leftovers, not an error") {
    val dir = java.nio.file.Files.createTempDirectory("funnel_crash").toString
    val b0 = new java.io.File(s"$dir/agg/b0")
    assert(b0.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(b0, "part-crashed.parquet").toPath, Array[Byte](9))
    // no _SUCCESS anywhere: the crashed writer's dir must be invisible
    assert(reportRows(dir).forall(_._3 === 0L))
  }
}
