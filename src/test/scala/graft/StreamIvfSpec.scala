package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.{Similarity, StreamIvf}

/** Streaming IVF index maintenance: MemoryStream micro-batches upsert
  * into the cell-partitioned index; the post-stream index must equal a
  * batch rebuild bit-for-bit and answer annIvf-shape searches
  * identically.
  */
case class IvfVec(vec_id: Long, embedding: Array[Float])

class StreamIvfSpec extends SparkSpec {
  import spark.implicits._

  private def vectors = Tables.table(spark, sf0001, "embeddings")
    .select(col("vec_id"), col("embedding"))
  private def centroids = vectors.filter(col("vec_id") % 25 === 0)
    .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))

  // stable comparable form of an index row
  private def rows(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Double, String)] =
    df.select(col("vec_id"), col("cent_id"), col("scale"),
        concat_ws(",", col("q")).as("qs"))
      .as[(Long, Long, Double, String)].collect().sortBy(_._1)

  test("streamed IVF index equals a batch rebuild and answers searches identically") {
    implicit val sqlCtx = spark.sqlContext
    val all = vectors.as[IvfVec].collect().sortBy(_.vec_id)
    val (chunk1, chunk2) = all.splitAt(all.length / 2)

    val path = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val checkpoint = java.nio.file.Files.createTempDirectory("ivf_ckpt").toString
    val mem = MemoryStream[IvfVec]
    val q = StreamIvf.start(mem.toDF(), centroids, path, checkpoint)
    try {
      mem.addData(chunk1.toSeq)
      q.processAllAvailable()
      // chunk2 plus a REPLAY of part of chunk1: at-least-once delivery
      // must resolve idempotently through the (vec_id, seq) upsert
      mem.addData(chunk2.toSeq ++ chunk1.take(20).toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamIvf.readIndex(spark, path)
    // seq differs between paths by construction (batch ids vs 0) — the
    // index CONTENT (assignment + quantization payload) must not
    val batchRebuild = StreamIvf.indexRows(vectors, centroids, seq = 0L)
    assert(rows(streamed).sameElements(rows(batchRebuild)))

    // the maintained index answers the annIvf-shaped search identically
    // to a search over the batch rebuild...
    val queryVecs = vectors.filter(col("vec_id") % 100 === 0)
    def answers(index: org.apache.spark.sql.DataFrame) =
      StreamIvf.search(index, queryVecs, centroids, 5)
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val streamedAnswers = answers(streamed)
    assert(streamedAnswers.sameElements(answers(batchRebuild)))
    // ...and matches the all-batch annIvf operator itself (same corpus:
    // every vector was streamed), so the streaming path earns the batch
    // operator's oracle transitively
    val batchOp = Similarity.annIvf(spark, sf0001)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(streamedAnswers.sameElements(batchOp))
  }

  test("annIvfIncremental (sliced replay + refresh) equals the rebuilt-index search") {
    val inc = ext.StreamIvf.annIvfIncremental(spark, sf0001)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val rebuilt = Similarity.annIvf(spark, sf0001)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(inc === rebuilt)
    assert(inc.nonEmpty)
  }

  test("a re-ingested vector resolves to its newest embedding (precombine on seq)") {
    implicit val sqlCtx = spark.sqlContext
    val first = vectors.as[IvfVec].collect().minBy(_.vec_id)
    val path = java.nio.file.Files.createTempDirectory("ivf_idx2").toString
    val checkpoint = java.nio.file.Files.createTempDirectory("ivf_ckpt2").toString
    val mem = MemoryStream[IvfVec]
    val q = StreamIvf.start(mem.toDF(), centroids, path, checkpoint)
    // same direction (same cosine → same cell: the resolvable refresh;
    // a cell-MOVING update is the documented non-global-index caveat),
    // different magnitude → different quantization scale to observe
    val updated = IvfVec(first.vec_id, first.embedding.map(_ * 2.0f))
    try {
      mem.addData(first)
      q.processAllAvailable()
      mem.addData(updated) // same key, later batch, different embedding
      q.processAllAvailable()
    } finally q.stop()
    val idx = StreamIvf.readIndex(spark, path)
    assert(idx.count() == 1)
    val expected = rows(StreamIvf.indexRows(
      Seq(updated).toDF(), centroids, seq = 0L))
    assert(rows(idx).sameElements(expected))
  }
}
