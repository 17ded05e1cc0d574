package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stream sources produce a Kafka-shaped frame — at minimum a `value`
  * column (JSON string/binary), optionally `topic`, `key`, `timestamp`
  * — which [[graft.cdc.Debezium.parse]] consumes. The engine's query
  * logic is format-independent; swapping MemoryStream/file/rate for
  * real Kafka is configuration, not code (the spark-sql-kafka jar is
  * absent in this offline environment, reference SURVEY §7.0).
  */
trait StreamSource {
  def load(spark: SparkSession): DataFrame
}

/** Kafka CDC topic source (production wiring; reference
  * multi_source_streaming_processor.py:76-96 semantics:
  * startingOffsets=latest, failOnDataLoss=false).
  */
final case class KafkaSource(
    bootstrapServers: String,
    topic: String,
    startingOffsets: String = "latest",
    failOnDataLoss: Boolean = false) extends StreamSource {
  override def load(spark: SparkSession): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", failOnDataLoss.toString)
      .load()
}

/** File-drop source of newline-delimited CDC JSON (each line becomes
  * the `value` column) — the offline stand-in for a Kafka topic with
  * identical downstream behavior.
  */
final case class JsonFileSource(path: String) extends StreamSource {
  override def load(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.{col, current_timestamp}
    spark.readStream
      .format("text")
      .load(path)
      .select(
        col("value").cast("string").as("value"),
        current_timestamp().as("timestamp"))
  }
}

/** Synthetic rate source (smoke/load tests). */
final case class RateSource(rowsPerSecond: Int = 100) extends StreamSource {
  override def load(spark: SparkSession): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
}
