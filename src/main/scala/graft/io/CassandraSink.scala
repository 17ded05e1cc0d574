package graft.io

import org.apache.spark.sql.DataFrame

/** Cassandra sink (production wiring for the reference's nominal
  * Cassandra leg — the spark-cassandra-connector jar is absent in this
  * offline environment, so construction is config-gated exactly like
  * [[KafkaSource]]).
  *
  * Semantics: Cassandra upserts by primary key natively, so a
  * foreachBatch append of the latest-precombine rows is an upsert —
  * the same per-batch dedup [[ParquetUpsertSink]] applies, minus the
  * read-merge-rewrite (the database does the merge). At scale the
  * connector partitions writes by token range; rows should be
  * repartitioned by partition key before the write to avoid hot
  * coordinators.
  */
final case class CassandraSink(
    keyspace: String,
    table: String,
    recordKeys: Seq[String],
    precombine: String) {

  /** foreachBatch body: dedup the batch by record key (latest
    * precombine wins, content-hash tie-break — shared [[Precombine]]
    * logic, same idempotent-replay property as the parquet sink) and
    * append — Cassandra's PK upsert does the rest.
    */
  def upsert(batch: DataFrame, batchId: Long): Unit = {
    Precombine.latest(batch, recordKeys, precombine)
      .write
      .format("org.apache.spark.sql.cassandra")
      .options(Map("keyspace" -> keyspace, "table" -> table))
      .mode("append")
      .save()
  }
}
