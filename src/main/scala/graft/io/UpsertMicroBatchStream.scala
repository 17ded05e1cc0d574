package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Offset of the upsert-table change stream: the newest archive commit
  * id consumed so far ("" = before the oldest retained commit). Commit
  * ids are zero-padded epoch-millis + batch id, so lexicographic order
  * IS commit order and offset comparison is plain string comparison.
  */
final case class UpsertCommitOffset(commit: String) extends Offset {
  override def json(): String = commit
}

/** Streaming READ path for upsert tables — the table as an incremental
  * change stream (Hudi incremental query / Delta CDF analog):
  *
  * {{{
  *   spark.readStream.format("graft-upsert")
  *     .option("startingOffset", "earliest")   // or "latest"
  *     .load(tablePath)
  * }}}
  *
  * Each micro-batch `(start, end]` emits the POST-image, as of commit
  * `end`, of every partition touched by a commit in the range — UPSERT
  * change semantics: a downstream consumer folds batches by record key
  * and converges to the table (tombstoned partitions simply stop
  * appearing, exactly like [[ParquetUpsertSink.readChangesSince]]).
  * Offsets are archive commit ids, so the stream REQUIRES the table's
  * writers to run with `keepVersions` > 1 (the archive is the commit
  * log) and deep enough that no commit in an unconsumed range is
  * pruned; a pruned `end` fails fast via the shared as-of planner
  * rather than silently collapsing the range.
  *
  * Scale shape: offset discovery is one archive-dir listing; batch
  * planning is metadata-only (manifest reads + one listing per touched
  * partition); batch I/O is the touched partitions' live-or-archived
  * file sets — an idle table streams for free, a busy one streams
  * proportionally to what changed. Replays of a checkpointed range
  * reconstruct the same post-image from the archive (deterministic
  * while retention covers it).
  *
  * MOR tables: delta commits do NOT archive, so the change stream
  * advances only at COMPACTION commits (which do) — the stream lags
  * unmerged deltas by design, exactly Hudi's incremental query over a
  * MOR table's read-optimized timeline. Writers that need low-latency
  * change streams set an inline `compactEvery` cadence or run COW.
  */
final class UpsertMicroBatchStream(path: String, required: StructType,
    partitionCol: String, startingOffset: String) extends MicroBatchStream {

  private def spark = SparkSession.active
  private def sink = ParquetUpsertSink(path, Seq("_unused"), "_unused", partitionCol)

  override def initialOffset(): Offset = startingOffset match {
    case "latest" => UpsertCommitOffset(
      ParquetUpsertSink.streamHighWatermark(spark, path).getOrElse(""))
    case "earliest" | "" => UpsertCommitOffset("")
    case other => throw new IllegalArgumentException(
      s"graft-upsert: startingOffset must be 'earliest' or 'latest', got '$other'")
  }

  // only the completed PREFIX of commits is streamable: an in-flight
  // mutation's archive dir exists before its overwrite lands (planning
  // live files against it would read mid-rewrite), and advancing PAST
  // a still-incomplete smaller commit id would skip it forever
  override def latestOffset(): Offset = UpsertCommitOffset(
    ParquetUpsertSink.streamHighWatermark(spark, path).getOrElse(""))

  override def deserializeOffset(json: String): Offset = UpsertCommitOffset(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val since = start.asInstanceOf[UpsertCommitOffset].commit
    val until = end.asInstanceOf[UpsertCommitOffset].commit
    if (until <= since) return Array.empty
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    sink.changedPartitionDirsBetween(spark, since, until)
      .flatMap { case (escaped, dir) =>
        val v = UpsertTableSource.dirValue(escaped)
        UpsertTableSource.dataFiles(fs, dir).map(f => UpsertFilePartition(f.toString, v))
      }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new UpsertReaderFactory(required, Some(partitionCol),
      UpsertTableSource.serializableConf(),
      // rename lineage: a batch whose offset lags behind later commits
      // (crash replay of a WAL-pinned range) plans ARCHIVED pre-image
      // dirs, and pre-rename commits' archives keep the OLD column
      // names — without the alias map the stream silently null-fills
      // the renamed column for exactly the replayed range
      aliases = ColumnAliases.parse(GraftUpsertCatalog.tableProps(path)))

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
