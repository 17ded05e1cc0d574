package graft.io

import org.apache.hadoop.fs.Path

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
  *  1. dedup the batch by record key, highest precombine wins; ties
  *     break on a content hash so replays resolve deterministically;
  *  2. read ONLY the partitions the batch touches (partition pruning —
  *     at 100 TB reading the whole table per batch is a non-starter);
  *     table existence is checked explicitly — read errors propagate
  *     rather than masquerading as "first batch" and dropping history;
  *  3. merge old+new, precombine again, apply delete tombstones;
  *  4. stage the merged rows to a sibling temp dir (bounded footprint,
  *     no lineage back to the files about to be replaced — safer than
  *     caching/localCheckpoint on long-running streams), then rewrite
  *     just the touched partitions via the per-writer dynamic-overwrite
  *     option (no session-conf mutation — concurrent upsert streams in
  *     one session must not race each other's conf);
  *  5. partitions whose keys were ALL tombstoned get their directories
  *     deleted explicitly (dynamic overwrite never rewrites a partition
  *     absent from the written data).
  *
  * Exactly-once degrades to at-least-once + idempotent rewrite (same
  * key + precombine + content always resolves the same way), the
  * documented divergence from Hudi (SURVEY §7.4 risk 3). Small-file
  * mitigation: rows are repartitioned by the partition column, one file
  * per partition dir.
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
    // ties at equal precombine break on a full-row hash: deterministic
    // across executions/replays (record keys are constant within the
    // window partition, so they cannot break ties)
    val contentHash = xxhash64(df.columns.sorted.map(col): _*)
    val w = Window
      .partitionBy(recordKeys.map(col): _*)
      .orderBy(col(precombine).desc, contentHash.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** foreachBatch body. */
  def upsert(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deduped = precombined(batch)
    // partition identity is the STRING form everywhere (it IS the dir
    // name); the read-back table infers the partition column's type
    // (e.g. DATE where the batch carries STRING) — value-typed set
    // compares would silently never match
    val parts = deduped.select(col(partitionCol).cast("string"))
      .distinct().collect().map(_.getString(0))
    if (parts.isEmpty) return

    val tableExists = fs.exists(new Path(path))
    // transient read failures below PROPAGATE (streaming retry handles
    // them); only genuine first-batch absence skips the merge
    val existing =
      if (tableExists)
        Some(spark.read.parquet(path)
          .filter(col(partitionCol).cast("string").isin(parts: _*))
          // align the inferred partition-column type back to the batch's
          .withColumn(partitionCol,
            col(partitionCol).cast(batch.schema(partitionCol).dataType)))
      else None
    val mergedAll = existing match {
      case Some(old) => precombined(old.unionByName(deduped))
      case None => deduped
    }
    val merged = deleteCol match {
      case Some(d) => mergedAll.filter(!coalesce(col(d), lit(false)))
      case None => mergedAll
    }

    def writeFinal(df: DataFrame): Unit =
      df.repartition(col(partitionCol))
        .write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic") // per-writer, race-free
        .partitionBy(partitionCol)
        .parquet(path)

    if (existing.isDefined) {
      // stage to a sibling dir: severs lineage from the files the
      // overwrite replaces, with a deterministic disk footprint
      val staging = s"${path}__staging_$batchId"
      try {
        merged.write.mode(SaveMode.Overwrite).parquet(staging)
        // an all-tombstoned merge writes no part files — nothing to read
        val hasRows = fs.exists(new Path(staging)) &&
          fs.listStatus(new Path(staging))
            .exists(st => st.getPath.getName.startsWith("part-") && st.getLen > 0)
        val surviving: Set[String] =
          if (hasRows) {
            val staged = spark.read.parquet(staging)
            writeFinal(staged)
            staged.select(col(partitionCol).cast("string")).distinct()
              .collect().map(_.getString(0)).toSet
          } else Set.empty
        // tombstoned-empty partitions: dynamic overwrite left their old
        // files in place — remove the directories explicitly
        parts.filterNot(surviving.contains).foreach { v =>
          fs.delete(new Path(s"$path/$partitionCol=$v"), true)
        }
      } finally fs.delete(new Path(staging), true)
    } else {
      writeFinal(merged)
    }
  }
}
