package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-based copy-on-write row-level operations for `graft-upsert`
  * tables — the hook that makes SQL `UPDATE`, `MERGE INTO`, and
  * subquery `DELETE` work against the table format:
  *
  * {{{
  *   UPDATE graft.`/data/t` SET amount = amount * 2 WHERE dept = 'eng'
  *   MERGE INTO graft.`/data/t` t USING updates s ON t.id = s.id
  *     WHEN MATCHED AND s.del THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  *   DELETE FROM graft.`/data/t` WHERE id IN (SELECT id FROM bad_ids)
  * }}}
  *
  * Execution shape (Spark's `ReplaceData` plan, same contract as
  * Iceberg's copy-on-write mode): the operation's scan reads the
  * affected groups — Spark's runtime group filtering
  * (`RowLevelOperationRuntimeGroupFiltering`) first narrows it to the
  * partitions containing matches via this scan's
  * `SupportsRuntimeFiltering` hook, so an UPDATE touching one
  * partition reads and rewrites ONE partition, not the table — the
  * rewritten rows stage as parquet task files, and the commit replaces
  * exactly the scanned groups ([[ParquetUpsertSink.replaceGroups]]).
  * Simple predicate-only DELETEs never reach this path: the optimizer's
  * metadata-delete rule routes them to [[UpsertTable.deleteWhere]].
  *
  * The operation instance spans planning and commit: `newScanBuilder`
  * captures the configured scan so the commit can ask it which
  * partition values it actually planned after runtime filtering — the
  * groups that must cease to exist.
  */
final class UpsertRowLevelOperation(path: String, tableSchema: StructType,
    partitionCol: String, cmd: RowLevelOperation.Command)
  extends RowLevelOperation {

  @volatile private var configuredScan: UpsertScan = _

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String = s"graft-upsert $cmd `$path`"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new UpsertScanBuilder(path, tableSchema, Some(partitionCol), None,
      onBuild = s => configuredScan = s,
      // the rewrite reads ALL rows of the planned groups — sub-group
      // data skipping on the command's condition would drop the
      // survivor rows the copy-on-write must carry over
      forRowLevelOp = true)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new UpsertReplaceGroupsWrite(path, info.schema(), partitionCol,
            () => {
              val scan = configuredScan
              require(scan != null,
                "graft-upsert: row-level commit before its scan was planned")
              scan.plannedPartitionValues.getOrElse(throw new IllegalStateException(
                "graft-upsert: row-level scan planned no partition set"))
            })
      }
    }
}

/** The `ReplaceData` batch write: stages the operation's output like
  * any upsert write, then commits by replacing the scanned groups.
  */
final class UpsertReplaceGroupsWrite(path: String, schema: StructType,
    partitionCol: String, replacedPartitions: () => Seq[String]) extends BatchWrite {

  private val stagingDir =
    s"$path/.staging-write-${java.util.UUID.randomUUID().toString.take(8)}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new UpsertDataWriterFactory(stagingDir, schema, dropOperationColumn = true)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val rows = UpsertTableWrite.readStaged(schema, messages).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    // honor the table's persisted retention/layout config — an UPDATE
    // archives pre-images exactly like an upsert commit would; when
    // writers passed keepVersions per-write without persisting it, the
    // observed archive depth stands in
    // ([[ParquetUpsertSink.effectiveKeepVersions]])
    val props = GraftUpsertCatalog.tableProps(path)
    val keys = props.get("recordKeys").map(_.split(',').map(_.trim).toSeq)
    val sink = ParquetUpsertSink(path,
      keys.getOrElse(Seq("_unused")), "_unused", partitionCol,
      filesPerPartition =
        if (keys.isDefined) props.get("filesPerPartition").map(_.toInt).getOrElse(1) else 1,
      keepVersions = ParquetUpsertSink.effectiveKeepVersions(spark, path,
        props.get("keepVersions").map(_.toInt)))
    try sink.replaceGroups(spark, replacedPartitions(), rows)
    finally UpsertTableWrite.drop(stagingDir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    UpsertTableWrite.drop(stagingDir)
}
