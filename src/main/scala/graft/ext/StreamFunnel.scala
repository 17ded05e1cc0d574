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
    if (batchId == 0L) DeltaStore.requireFreshRun(dir, Seq("agg"))
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

  /** Start the funnel maintainer. `compactEvery` > 0 folds the keys/
    * delta store every Nth batch ([[compactKeys]]) so state stays
    * bounded on unbounded runs; 0 = never (every delta kept, the
    * pre-compaction behavior). `ttlBatches` bounds the dedup horizon
    * at compaction time (see [[compactKeys]]).
    */
  def start(docs: DataFrame, dir: String, checkpoint: String,
      compactEvery: Int = 0, ttlBatches: Option[Long] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: java.lang.Long) =>
        ingestBatch(batch, dir, batchId)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          compactKeys(batch.sparkSession, dir, batchId, ttlBatches)
      }
      .start()

  /** COMMITTED delta dirs under `root` (a `_SUCCESS` marker present):
    * a crashed batch's half-written dir (or a bare `_temporary`) must
    * be invisible to readers — the stream will replay it with
    * overwrite semantics.
    */
  private def committed(root: String): Seq[String] = DeltaStore.committed(root)

  /** Fold the keys/ delta store into one base table — the bounded-state
    * move for unbounded runs. Every committed delta (and any previous
    * base) collapses to min(bid, keeper, keeper_c4) per key; the fold
    * is the SAME associative min the report computes, so report-before
    * ≡ report-after, and because min is idempotent over duplicate
    * rows, a crash that leaves both the new base and already-folded
    * deltas on disk (or a replayed batch re-writing a folded delta's
    * dir) still reads correctly — cleanup is garbage collection, not
    * a correctness step.
    *
    * `ttlBatches` = Some(t): keys FIRST SEEN at or before
    * `upToBatch - t` are dropped from the base — the watermark
    * discipline applied to the dedup horizon. A key re-arriving after
    * expiry counts as a fresh keeper; n5 thereafter means "keepers
    * within the horizon", the bounded-state tradeoff every streaming
    * dedup store makes (state can't witness arrivals it no longer
    * remembers). None = exact forever (state grows with the distinct
    * key count — the same order as any dedup index).
    */
  def compactKeys(spark: SparkSession, dir: String, upToBatch: Long,
      ttlBatches: Option[Long] = None): Unit =
    DeltaStore.compact(spark, s"$dir/keys", upToBatch) { all =>
      val base = all
        .groupBy(col("k"))
        .agg(min(struct(col("bid"), col("keeper"), col("keeper_c4"))).as("m"))
        .select(col("k"), col("m.keeper").as("keeper"),
          col("m.keeper_c4").as("keeper_c4"), col("m.bid").as("bid"))
      ttlBatches match {
        case Some(t) => base.filter(col("bid") > upToBatch - t)
        case None    => base
      }
    }

  /** The funnel report over everything ingested so far — same 6-row
    * shape as [[Prep.filterFunnel]]. Before the first batch COMMITS
    * (no deltas on disk yet, or only a crashed writer's uncommitted
    * leftovers) the report is all zeros, not an error.
    */
  def report(spark: SparkSession, dir: String): DataFrame = {
    val aggDirs = committed(s"$dir/agg")
    if (aggDirs.isEmpty) {
      return Prep.funnelReport(spark.range(1).select(
        lit(0L).as("n0"), lit(0L).as("n1"), lit(0L).as("n2"),
        lit(0L).as("n3"), lit(0L).as("n4"), lit(0L).as("n5")))
    }
    val aggs = spark.read.parquet(aggDirs: _*)
    // first arrival per content key across deltas (and the compacted
    // base, if present — its rows fold identically): min (bid, keeper)
    val keyDirs = committed(s"$dir/keys")
    val n5 =
      if (keyDirs.isEmpty)
        // agg committed but keys not yet (crash between the two
        // writes): the batch will replay; report zeros, don't throw
        spark.range(1).select(lit(0L).as("n5"))
      else
        spark.read.parquet(keyDirs: _*)
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
