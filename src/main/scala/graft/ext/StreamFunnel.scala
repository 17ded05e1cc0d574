package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental quality-filter funnel over a document stream — the
  * streaming twin of [[Prep.filterFunnel]]. Each micro-batch appends a
  * small, replay-deterministic delta (its per-batch counters and its
  * content-key table); the funnel report derives from the accumulated
  * deltas at read time, so a crashed batch can replay with OVERWRITE
  * semantics and change nothing.
  *
  * Keeper semantics online: batch n0..n4 count every arriving doc
  * (duplicates included), exactly like the batch funnel; the
  * exact-keeper stage keeps a content key's FIRST arrival (min doc_id
  * within its first batch) — identical to the batch funnel's
  * min-doc_id keeper whenever keys first arrive with their minimal
  * doc_id (e.g. doc_id-ordered ingest, the spec's setup), and the only
  * definition available without reprocessing history otherwise.
  *
  * Scale shape: per batch, one [[Prep.funnelFlags]] projection + one
  * slim key aggregation (doc text never leaves the batch scan); state
  * on disk is one key row per distinct content key — the same order of
  * growth as the dedup index any incremental ingest already keeps.
  * The report aggregates bounded per-batch counter rows plus one
  * min-per-key pass over the key table.
  */
object StreamFunnel {

  /** Replay-deterministic per-batch delta: counters + batch-local key
    * table, written with overwrite into the batch's own directory.
    *
    * CONTRACT: `dir` and the query's checkpointLocation live and die
    * together — batch ids are the delta keys, so restarting with a
    * fresh checkpoint against a dir holding an older run's deltas
    * would interleave two unrelated runs. Guarded: batch 0 against a
    * dir already holding later batches fails fast instead of
    * corrupting the report.
    */
  def ingestBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    if (batchId == 0L) {
      val aggRoot = new java.io.File(s"$dir/agg")
      val stale = Option(aggRoot.list()).getOrElse(Array.empty[String])
        .exists(n => n.startsWith("b") && n != "b0")
      require(!stale,
        s"$dir holds deltas from a previous run but the stream restarted " +
          "at batch 0 (fresh checkpoint?) — use a fresh output dir or " +
          "keep dir and checkpoint together")
    }
    val f = Prep.funnelFlags(batch).localCheckpoint() // consumed twice
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val counters = f.agg(count(lit(1)).as("n0"), cnt(col("c1")).as("n1"),
      cnt(col("c2")).as("n2"), cnt(col("c3")).as("n3"), cnt(col("c4")).as("n4"))
    // batch-local keeper per key; min(struct) carries the keeper row's
    // c4 along with it (doc_id is unique, so the struct order is the
    // doc_id order)
    val keys = f.groupBy(col("k"))
      .agg(min(struct(col("doc_id"), col("c4"))).as("m"))
      .select(col("k"), col("m.doc_id").as("keeper"), col("m.c4").as("keeper_c4"),
        lit(batchId).as("bid"))
    counters.coalesce(1).write.mode("overwrite").parquet(s"$dir/agg/b$batchId")
    keys.write.mode("overwrite").parquet(s"$dir/keys/b$batchId")
  }

  def start(docs: DataFrame, dir: String, checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: java.lang.Long) =>
        ingestBatch(batch, dir, batchId)
      }
      .start()

  /** The funnel report over everything ingested so far — same 6-row
    * shape as [[Prep.filterFunnel]]. Before the first batch commits
    * (no deltas on disk yet) the report is all zeros, not an error.
    */
  def report(spark: SparkSession, dir: String): DataFrame = {
    if (!new java.io.File(s"$dir/agg").isDirectory) {
      return Prep.funnelReport(spark.range(1).select(
        lit(0L).as("n0"), lit(0L).as("n1"), lit(0L).as("n2"),
        lit(0L).as("n3"), lit(0L).as("n4"), lit(0L).as("n5")))
    }
    val aggs = spark.read.parquet(s"$dir/agg/*")
    // first arrival per content key across batches: min (bid, keeper)
    // — one row per batch per key, so the struct min picks the
    // earliest batch's keeper and its c4
    val n5 = spark.read.parquet(s"$dir/keys/*")
      .groupBy(col("k"))
      .agg(min(struct(col("bid"), col("keeper"), col("keeper_c4"))).as("m"))
      .agg(sum(when(col("m.keeper_c4"), 1L).otherwise(0L)).as("n5"))
    val totals = aggs.agg(sum(col("n0")).as("n0"), sum(col("n1")).as("n1"),
      sum(col("n2")).as("n2"), sum(col("n3")).as("n3"), sum(col("n4")).as("n4"))
      .crossJoin(n5)
      .select(coalesce(col("n0"), lit(0L)).as("n0"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"),
        coalesce(col("n3"), lit(0L)).as("n3"),
        coalesce(col("n4"), lit(0L)).as("n4"),
        coalesce(col("n5"), lit(0L)).as("n5"))
    Prep.funnelReport(totals)
  }
}
