package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hudi-semantics upsert sink over plain parquet, for streaming
  * `foreachBatch` (the Hudi jar is unavailable offline; reference
  * semantics from multi_source_streaming_processor.py:260-292:
  * COPY_ON_WRITE, record key + precombine field, partitioned by
  * `processing_date`).
  *
  * Per micro-batch:
  *  1. dedup the batch itself by record key, keeping the highest
  *     precombine value (row_number, ties → arbitrary-but-stable by the
  *     full key ordering);
  *  2. read ONLY the partitions the batch touches (partition pruning —
  *     at 100 TB reading the whole table per batch is a non-starter);
  *  3. anti-join-free merge: union old+new, precombine again, rewrite
  *     just those partitions (dynamic partition overwrite).
  *
  * Exactly-once degrades to at-least-once + idempotent rewrite (same
  * key+precombine always wins), the documented divergence from Hudi
  * (SURVEY §7.4 risk 3). Small-file mitigation: each rewritten
  * partition is coalesced to `filesPerPartition`.
  */
final case class ParquetUpsertSink(
    path: String,
    recordKeys: Seq[String],
    precombine: String,
    partitionCol: String,
    filesPerPartition: Int = 1,
    // optional boolean tombstone column: when the LATEST version of a key
    // is a delete, the key disappears from the table (the reference drops
    // CDC deletes entirely — SURVEY P2; this closes that gap)
    deleteCol: Option[String] = None) {

  private def precombined(df: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(recordKeys.map(col): _*)
      .orderBy(col(precombine).desc +: recordKeys.map(col(_).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** foreachBatch body. */
  def upsert(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val deduped = precombined(batch).cache()
    try {
      val parts = deduped.select(col(partitionCol)).distinct().collect().map(_.get(0))
      if (parts.nonEmpty) {
        val existing =
          try Some(
            spark.read.parquet(path)
              // partition pruning: only the touched partitions are read
              .filter(col(partitionCol).isin(parts: _*)))
          catch { case _: Exception => None } // first batch: no table yet
        val mergedAll = existing match {
          case Some(old) => precombined(old.unionByName(deduped))
          case None => deduped
        }
        val merged0 = deleteCol match {
          case Some(d) => mergedAll.filter(!coalesce(col(d), lit(false)))
          case None => mergedAll
        }
        // materialize BEFORE overwriting: the merged plan lazily reads
        // the very files the dynamic overwrite is about to replace —
        // localCheckpoint severs that lineage (self-overwrite hazard)
        val merged = if (existing.isDefined) merged0.localCheckpoint(true) else merged0
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try
          // repartition BY the partition column: all rows of one value
          // land in one task → one file per partition dir (small-file
          // mitigation; raise filesPerPartition by salting if a single
          // partition outgrows one task at scale)
          merged
            .repartition(col(partitionCol))
            .write
            .mode(SaveMode.Overwrite)
            .partitionBy(partitionCol)
            .parquet(path)
        finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
    } finally deduped.unpersist()
  }
}
