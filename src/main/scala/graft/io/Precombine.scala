package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared precombine dedup for the upsert sink family: latest
  * `precombine` per record key wins; ties at equal precombine break on
  * a full-row content hash — deterministic across executions and
  * replays (record keys are constant within the window partition and
  * cannot break ties).
  */
object Precombine {
  def latest(df: DataFrame, recordKeys: Seq[String], precombine: String): DataFrame = {
    val contentHash = xxhash64(df.columns.sorted.toIndexedSeq.map(col): _*)
    val w = Window
      .partitionBy(recordKeys.map(col): _*)
      .orderBy(col(precombine).desc, contentHash.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
