package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, plus a partition-wise feature-extraction pipeline.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/
  * audio codecs in this environment); everything Spark-side is real:
  * schema, batch shape (mapPartitions processes a whole partition per
  * task, amortizing per-batch decoder setup exactly like mapInPandas
  * batches), partitioning, and the expression-only fast path used by
  * the oracle-checked query.
  *
  * At 100 TB: payloads stay columnar parquet binary; decode tasks are
  * embarrassingly parallel; only extracted (small) features ever
  * shuffle.
  */
object Multimodal {

  /** Typed media row: payload + metadata, as a training pipeline would
    * stage images/audio before feature extraction.
    */
  case class MediaRecord(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte],
      byte_len: Long)

  /** Extracted features (decode STUB output). */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      mean_byte: Double,
      frame_count: Int)

  /** Stage documents.text as binary payloads (stand-in for real media
    * blobs) with typed metadata.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.table(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"))
      .as[MediaRecord]
  }

  /** STUB decoder — deterministic fake standing in for a real codec
    * (??? in production: JPEG/PNG decode, PCM frames, video framesample).
    * Batch shape is real: one decoder "session" per partition.
    */
  def decodeStub(records: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    // per-partition decoder init would happen here (real codecs are heavy)
    records.map { r =>
      val mean =
        if (r.payload.isEmpty) 0.0
        else r.payload.map(b => (b & 0xff).toDouble).sum / r.payload.length
      val frames = r.media_type match {
        case "image" => 1
        case "audio" => (r.byte_len / 64).toInt + 1
        case _ => (r.byte_len / 256).toInt + 1
      }
      MediaFeatures(r.doc_id, r.media_type, r.byte_len,
        math.rint(mean * 10000) / 10000, frames)
    }
  }

  /** Partition-wise feature extraction through the stub decoder. */
  def extractFeatures(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, sfDir).mapPartitions(decodeStub)
  }

  /** Oracle-checked query: the expression-only feature path (payload
    * length, content hash, stub frame count) — everything DuckDB can
    * recompute from the same bytes.
    */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).toDF()
      .select(
        col("doc_id"), col("media_type"), col("byte_len"),
        md5(col("payload")).as("content_md5"),
        when(col("media_type") === "image", 1)
          .when(col("media_type") === "audio", (col("byte_len") / 64).cast("int") + 1)
          .otherwise((col("byte_len") / 256).cast("int") + 1).as("frame_count"))
      .transform(graft.Present.sortSmall(_, col("doc_id")))

  val mediaFeaturesSql: String =
    """SELECT doc_id,
      |       CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio'
      |            ELSE 'video' END AS media_type,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |       md5(text) AS content_md5,
      |       CASE WHEN doc_id % 3 = 0 THEN 1
      |            WHEN doc_id % 3 = 1 THEN CAST(octet_length(encode(text)) // 64 AS INTEGER) + 1
      |            ELSE CAST(octet_length(encode(text)) // 256 AS INTEGER) + 1 END AS frame_count
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Frame-sampling shape: explode each media payload into its (stub)
    * frames, compute a per-frame feature (deterministic md5-derived
    * stand-in for a decoded-frame embedding), roll back up per media.
    * The explode→feature→agg pipeline is the real Spark plumbing a
    * video pipeline needs; only the pixel decode is faked. Frames are
    * capped (frame skip) so row blowup is bounded at any payload size.
    */
  def frameFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val maxFrames = 8
    val media = mediaTable(spark, sfDir).toDF()
      .withColumn("n_frames",
        when(col("media_type") === "image", 1)
          .when(col("media_type") === "audio", (col("byte_len") / 64).cast("int") + 1)
          .otherwise((col("byte_len") / 256).cast("int") + 1))
      .withColumn("sampled_frames", least(col("n_frames"), lit(maxFrames)))
    media
      .select(col("doc_id"), col("media_type"), col("n_frames"),
        explode(sequence(lit(0), col("sampled_frames") - 1)).as("frame_idx"))
      .withColumn("frame_feature",
        conv(substring(md5(concat(col("doc_id"), lit(":"), col("frame_idx")).cast("binary")),
          1, 8), 16, 10).cast("long"))
      .groupBy(col("doc_id"), col("media_type"), col("n_frames"))
      .agg(
        count(lit(1)).as("frames_sampled"),
        sum(col("frame_feature")).as("feature_sum"),
        min(col("frame_feature")).as("feature_min"))
      .transform(graft.Present.sortSmall(_, col("doc_id")))
  }

  val frameFeaturesSql: String =
    """WITH media AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio'
      |              ELSE 'video' END AS media_type,
      |         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
      |  FROM documents),
      |framed AS (
      |  SELECT doc_id, media_type,
      |         CASE WHEN media_type = 'image' THEN 1
      |              WHEN media_type = 'audio' THEN CAST(byte_len // 64 AS INTEGER) + 1
      |              ELSE CAST(byte_len // 256 AS INTEGER) + 1 END AS n_frames
      |  FROM media),
      |frames AS (
      |  SELECT doc_id, media_type, n_frames, unnest(range(least(n_frames, 8))) AS frame_idx
      |  FROM framed)
      |SELECT doc_id, media_type, n_frames,
      |       count(*) AS frames_sampled,
      |       CAST(sum(('0x' || substr(md5(doc_id || ':' || frame_idx), 1, 8))::BIGINT) AS BIGINT)
      |         AS feature_sum,
      |       min(('0x' || substr(md5(doc_id || ':' || frame_idx), 1, 8))::BIGINT)
      |         AS feature_min
      |FROM frames
      |GROUP BY 1, 2, 3
      |ORDER BY doc_id""".stripMargin
}
