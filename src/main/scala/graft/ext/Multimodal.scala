package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, plus a partition-wise feature-extraction pipeline.
  *
  * Two decode tiers:
  *  - REAL image decode ([[decodeImages]]): `javax.imageio` PNG/JPEG
  *    inside the same partition-wise `mapPartitions` batch shape,
  *    oracle-gated end to end (`x_media_decode`) against
  *    formula-generated fixtures whose pixel statistics DuckDB
  *    recomputes analytically — the decode is provably correct, not
  *    simulated.
  *  - A deterministic STUB ([[decodeStub]]) for codecs this
  *    environment lacks (audio PCM, video framesample); its Spark-side
  *    plumbing (schema, batch shape, partitioning) is identical, so
  *    swapping a real codec in is a per-row function change.
  *
  * At 100 TB: payloads stay columnar parquet binary; decode tasks are
  * embarrassingly parallel (one decoder session per PARTITION, not per
  * row); only extracted (small) features ever shuffle.
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

  // ——— REAL image decode (javax.imageio) ———

  /** Features read off DECODED pixels — exact integers so the oracle
    * can recompute them without float-rounding ambiguity. `pix_checksum`
    * is position-weighted, so any pixel transposition or channel swap
    * in the decode path changes it.
    */
  case class DecodedImage(
      doc_id: Long,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      pix_checksum: Long)

  private val FixtureDim = 16

  /** Deterministic PNG fixture for `docId`: a 16×16 RGB image whose
    * channel values follow a closed-form formula of (doc_id, x, y) —
    * so DuckDB can compute the DECODED image's statistics analytically
    * and a hash match proves the real codec round-trip (PNG is
    * lossless RGB). JDK PNG encoding carries no timestamps — the
    * fixture bytes are bit-stable across runs.
    */
  def syntheticPng(docId: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      FixtureDim, FixtureDim, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < FixtureDim) {
      var x = 0
      while (x < FixtureDim) {
        val r = ((docId * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((docId * 17 + x * 11 + y * 3) % 256).toInt
        val b = ((docId * 23 + x * 5 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Same fixture as JPEG — LOSSY, so it has no exact oracle; the spec
    * checks dimensions exactly and channel means within tolerance.
    */
  def syntheticJpeg(docId: Long): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(syntheticPng(docId)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** REAL partition-wise image decode with genuinely amortized codec
    * setup: ONE `ImageReader` per format per PARTITION, obtained from
    * the registry once and re-`setInput` per payload (the format is
    * sniffed from the magic bytes — PNG `\x89PNG`, JPEG `\xFF\xD8` —
    * so no per-row registry probe either). `ImageIO.read` per record
    * would pay the service-registry scan + reader construction on
    * every row, exactly the per-row cost the partition batch shape
    * exists to avoid at 100 TB. Readers are disposed when the
    * partition's iterator drains.
    */
  def decodeImages(records: Iterator[MediaRecord]): Iterator[DecodedImage] = {
    val readers = scala.collection.mutable.HashMap.empty[String, javax.imageio.ImageReader]
    def readerFor(fmt: String): javax.imageio.ImageReader =
      readers.getOrElseUpdate(fmt, {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        require(it.hasNext, s"no ImageIO reader for format $fmt")
        it.next()
      })
    def sniff(p: Array[Byte]): String =
      if (p.length >= 4 && (p(0) & 0xff) == 0x89 && p(1) == 'P' &&
        p(2) == 'N' && p(3) == 'G') "png"
      else if (p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) "jpeg"
      else "png" // let the reader fail loudly on truly unknown bytes
    val out = records.map { r =>
      val reader = readerFor(sniff(r.payload))
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val img =
        try { reader.setInput(in, true, true); reader.read(0) }
        finally in.close()
      require(img != null, s"undecodable image payload for doc ${r.doc_id}")
      var (sr, sg, sb, ck) = (0L, 0L, 0L, 0L)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val red = (rgb >> 16) & 0xff
          val green = (rgb >> 8) & 0xff
          val blue = rgb & 0xff
          sr += red; sg += green; sb += blue
          ck += (x + img.getWidth.toLong * y + 1) * (red + 2L * green + 3L * blue)
          x += 1
        }
        y += 1
      }
      DecodedImage(r.doc_id, img.getWidth, img.getHeight, sr, sg, sb, ck)
    }
    // dispose the per-partition readers after the last record (the
    // appended thunk runs when the iterator drains)
    out ++ { readers.valuesIterator.foreach(_.dispose()); Iterator.empty }
  }

  /** Oracle-gated REAL-decode query (`x_media_decode`): generate the
    * PNG fixtures for a documents sample, decode them with the real
    * codec partition-wise, emit exact pixel statistics. The DuckDB
    * twin never sees the PNG bytes — it recomputes the statistics from
    * the generating formula, so the hash match certifies the
    * encode→decode round-trip reproduced every pixel.
    */
  def mediaDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id")).filter(col("doc_id") % 5 === 0)
      .as[Long]
    val decoded = ids
      .mapPartitions(_.map(id =>
        MediaRecord(id, "image", syntheticPng(id), 0L)))
      .mapPartitions(decodeImages)
    decoded.toDF()
      .transform(graft.Present.sortSmall(_, col("doc_id")))
  }

  val mediaDecodeSql: String =
    """WITH px AS (
      |  SELECT d.doc_id, x.range AS x, y.range AS y
      |  FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d,
      |       range(16) x, range(16) y),
      |rgb AS (
      |  SELECT doc_id, x, y,
      |         (doc_id*31 + x*7 + y*13) % 256 AS r,
      |         (doc_id*17 + x*11 + y*3) % 256 AS g,
      |         (doc_id*23 + x*5 + y*19) % 256 AS b
      |  FROM px)
      |SELECT doc_id,
      |       CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
      |       CAST(sum(r) AS BIGINT) AS sum_r,
      |       CAST(sum(g) AS BIGINT) AS sum_g,
      |       CAST(sum(b) AS BIGINT) AS sum_b,
      |       CAST(sum((x + 16*y + 1) * (r + 2*g + 3*b)) AS BIGINT) AS pix_checksum
      |FROM rgb
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

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

  // ——— media dedup ———

  /** Exact media dedup: payload content hash within a modality →
    * keeper + copy count, [[Dedup.exact]]'s shape lifted onto the
    * binary column (the hash key is the payload BYTES — for media
    * there is no "normalize then hash" shortcut, the bytes are the
    * identity). One hash shuffle with map-side partial agg; at 100 TB
    * the md5 streams with the scan and only (type, key) groups
    * exchange.
    */
  def mediaDedupExact(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).toDF()
      .groupBy(col("media_type"), md5(col("payload")).as("content_key"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))
      .transform(graft.Present.sortSmall(_, col("media_type"), col("keeper_doc_id")))

  val mediaDedupExactSql: String =
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio'
      |            ELSE 'video' END AS media_type,
      |       md5(text) AS content_key,
      |       min(doc_id) AS keeper_doc_id,
      |       count(*) AS n_copies
      |FROM documents
      |GROUP BY 1, 2
      |ORDER BY media_type, keeper_doc_id""".stripMargin

  /** Banding granularity and verify tolerances for
    * [[mediaDedupFeature]]: band on f1 in [[featureEps]]-wide buckets
    * (probe own + both neighbor bands, so no true pair at the
    * tolerance can straddle away), verify |Δf1| ≤ eps, |Δf2| ≤ eps/2,
    * and byte lengths within 2%.
    */
  val featureEps = 0.002

  /** Feature-space media near-dup: block on a quantized stub
    * "perceptual" feature, verify candidates exactly — the media twin
    * of the banded embedding LSH ([[Similarity]]), demonstrating the
    * decode→feature→band→verify pipeline on the staged binary column.
    * The features play the role of a perceptual hash (decoded-content
    * statistics, NOT byte identity): f1 = separator density, f2 =
    * digit density over the decoded payload, both cheap codegen'd
    * expressions standing in for the real (stubbed, [[decodeStub]])
    * image/audio feature extractor.
    *
    * Scale shape: per-row features, explode ×3 band keys, hash
    * shuffle on (media_type, f1 band, LENGTH bucket), in-band pair
    * join + exact verify, distinct to collapse multi-band hits. The
    * length bucket (log-scale, base 1/0.98 — one bucket per 2%
    * length step, the verify tolerance, with ±1 probing so no true
    * pair can straddle away) is what keeps buckets bounded at scale:
    * a 1-D scalar band concentrates mass on a large corpus (the sf1
    * scaling point measured 92 s on 10× data before the second key;
    * candidates were quadratic inside the fat f1 bands), while
    * (f1, length) blocks shrink with corpus diversity. Results are
    * IDENTICAL — the verify already required lengths within 2%, the
    * bucket only prunes candidates that verification would reject.
    * The production path for rich features remains the multi-band
    * embedding LSH ([[Similarity.dedupByEmbeddingLsh]]).
    */
  def mediaDedupFeature(spark: SparkSession, sfDir: String): DataFrame = {
    val media = mediaTable(spark, sfDir).toDF()
      .withColumn("txt", decode(col("payload"), "UTF-8"))
      .withColumn("f1", round(
        (length(col("txt")) - length(regexp_replace(col("txt"), " ", "")))
          .cast("double") / col("byte_len"), 4))
      .withColumn("f2", round(
        (length(col("txt")) - length(regexp_replace(col("txt"), "[0-9]", "")))
          .cast("double") / col("byte_len"), 4))
      .select(col("doc_id"), col("media_type"), col("byte_len"), col("f1"), col("f2"))
    // log-scale length bucket: a true pair (lengths within 2%) sits
    // within one bucket step, so the probe side's ±1 explode covers it
    val lenb = floor(log(col("byte_len").cast("double"))
      / lit(math.log(1.0 / 0.98))).cast("long")
    val banded = media.select(col("doc_id"), col("media_type"),
      col("byte_len"), col("f1"), col("f2"), lenb.as("lenb"),
      explode(array(Seq(-1, 0, 1).map(d =>
        (floor(col("f1") / featureEps) + d).cast("long")): _*)).as("band"))
    // (an f2 band as a third key was MEASURED and rejected: f2 has too
    // little diversity on this corpus to cut candidates, and the extra
    // probe explode tripled the shuffled rows — 16.5 s → 26.4 s at the
    // synthetic sf1)
    val a = banded.select(col("media_type"), col("band"), col("lenb"),
      col("doc_id").as("doc_a"), col("byte_len").as("len_a"),
      col("f1").as("f1a"), col("f2").as("f2a"))
    val b = banded.select(col("media_type"), col("band"),
      explode(array(col("lenb") - 1, col("lenb"), col("lenb") + 1)).as("lenb"),
      col("doc_id").as("doc_b"), col("byte_len").as("len_b"),
      col("f1").as("f1b"), col("f2").as("f2b"))
    graft.Present.sortSmall(
      a.join(b, Seq("media_type", "band", "lenb"))
        .filter(col("doc_a") < col("doc_b"))
        .filter(abs(col("f1a") - col("f1b")) <= featureEps)
        .filter(abs(col("f2a") - col("f2b")) <= featureEps / 2)
        .filter(least(col("len_a"), col("len_b")).cast("double")
          / greatest(col("len_a"), col("len_b")) >= 0.98)
        .select(col("media_type"), col("doc_a"), col("doc_b"),
          round(abs(col("f1a") - col("f1b")), 4).as("d_f1"))
        .distinct(), // a pair can meet in up to 3 bands — emit once
      col("media_type"), col("doc_a"), col("doc_b"))
  }

  /** DuckDB twin of [[mediaDedupFeature]]: same rounded features, same
    * 3-band probe, same verify, same distinct.
    */
  val mediaDedupFeatureSql: String =
    s"""WITH m AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio'
      |              ELSE 'video' END AS media_type,
      |         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |         round((length(text) - length(replace(text, ' ', '')))::DOUBLE
      |               / octet_length(encode(text)), 4) AS f1,
      |         round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
      |               / octet_length(encode(text)), 4) AS f2
      |  FROM documents),
      |banded AS (
      |  SELECT doc_id, media_type, byte_len, f1, f2,
      |         CAST(floor(ln(byte_len::DOUBLE) / ln(1.0 / 0.98)) AS BIGINT) AS lenb,
      |         CAST(floor(f1 / $featureEps) + d AS BIGINT) AS band
      |  FROM m, (SELECT unnest([-1, 0, 1]) AS d))
      |SELECT DISTINCT a.media_type AS media_type, a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       round(abs(a.f1 - b.f1), 4) AS d_f1
      |FROM banded a
      |JOIN (SELECT b0.*, b0.lenb + e AS lenbp
      |      FROM banded b0, (SELECT unnest([-1, 0, 1]) AS e)) b
      |  ON a.media_type = b.media_type AND a.band = b.band
      | AND a.lenb = b.lenbp AND a.doc_id < b.doc_id
      |WHERE abs(a.f1 - b.f1) <= $featureEps
      |  AND abs(a.f2 - b.f2) <= ${featureEps / 2}
      |  AND least(a.byte_len, b.byte_len)::DOUBLE / greatest(a.byte_len, b.byte_len) >= 0.98
      |ORDER BY media_type, doc_a, doc_b""".stripMargin

  /** Target long edge (pixels) for [[mediaResize]] — the ViT-era
    * standard input size.
    */
  val resizeTarget = 224

  /** Resize planning for visual media — the third mandated media op
    * (decode / feature-extract / RESIZE / frame-sample): decode the
    * source dimensions (STUB: deterministic fake dims from the payload
    * bytes, standing in for the codec's header read), then compute the
    * aspect-preserving downscale to a [[resizeTarget]] long edge in
    * EXACT integer arithmetic (`w*224 DIV max(w,h)` — engine-portable,
    * no float rounding). No upscale: media already inside the target
    * keeps its dimensions. Audio is out of scope for a 2-D resize.
    *
    * Scale shape: pure per-row math on the scan — the real pixel
    * resample this plans for is executed inside the partition-wise
    * decoder ([[decodeStub]]'s slot), where the resize plan's
    * (out_w, out_h) become the codec's target buffer.
    */
  def mediaResize(spark: SparkSession, sfDir: String): DataFrame = {
    val media = mediaTable(spark, sfDir).toDF()
      .filter(col("media_type") =!= "audio")
      // stub header decode: width from the byte length, height from
      // the content hash — deterministic, DuckDB-replayable
      .withColumn("src_w", lit(64) + col("byte_len") % 448)
      .withColumn("src_h", lit(64) +
        conv(substring(md5(col("payload")), 1, 8), 16, 10).cast("long") % 448)
      .withColumn("long_edge", greatest(col("src_w"), col("src_h")))
    graft.Present.sortSmall(
      media.select(
        col("doc_id"), col("media_type"), col("src_w"), col("src_h"),
        when(col("long_edge") <= resizeTarget, col("src_w"))
          .otherwise(expr(s"src_w * $resizeTarget DIV long_edge")).as("out_w"),
        when(col("long_edge") <= resizeTarget, col("src_h"))
          .otherwise(expr(s"src_h * $resizeTarget DIV long_edge")).as("out_h"),
        (col("long_edge") > resizeTarget).as("resized")),
      col("doc_id"))
  }

  /** DuckDB twin of [[mediaResize]]: same stub dims, same integer
    * division.
    */
  val mediaResizeSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'video' END AS media_type,
       |         64 + CAST(octet_length(encode(text)) AS BIGINT) % 448 AS src_w,
       |         64 + ('0x' || substr(md5(text), 1, 8))::BIGINT % 448 AS src_h
       |  FROM documents
       |  WHERE doc_id % 3 != 1),
       |g AS (SELECT *, greatest(src_w, src_h) AS long_edge FROM m)
       |SELECT doc_id, media_type, src_w, src_h,
       |       CASE WHEN long_edge <= $resizeTarget THEN src_w
       |            ELSE src_w * $resizeTarget // long_edge END AS out_w,
       |       CASE WHEN long_edge <= $resizeTarget THEN src_h
       |            ELSE src_h * $resizeTarget // long_edge END AS out_h,
       |       long_edge > $resizeTarget AS resized
       |FROM g
       |ORDER BY doc_id""".stripMargin

  /** Stub media-embedding dimensionality and keep threshold for
    * [[mediaTextAlign]]. Random-vector alignment scores distribute
    * ~N(0, 1/√dims); 0.1 keeps roughly the upper third — the shape of
    * a CLIP-score cut, not a tuned constant.
    */
  val alignDims = 16
  val alignThreshold = 0.1

  /** Image/audio/video ↔ text alignment scoring — the CLIP-filter
    * shape of multimodal corpus curation (LAION-style): join each
    * media payload's embedding against its caption text's embedding
    * (the `embeddings` table, keyed by doc id) and keep pairs whose
    * cosine clears [[alignThreshold]]. The media embedding is the
    * decode STUB's output (deterministic md5-derived vector from the
    * payload content — the slot a real image tower fills); the join,
    * the vector math, and the keep/drop gate are the real pipeline.
    *
    * Scale shape: per-row stub vector + ONE hash join on the id (the
    * embedding side broadcast when small), zip_with/aggregate dot
    * products inside codegen — no shuffle beyond the join.
    */
  def mediaTextAlign(spark: SparkSession, sfDir: String): DataFrame = {
    val media = mediaTable(spark, sfDir).toDF()
      .withColumn("content_md5", md5(col("payload")))
      .select(col("doc_id"), col("media_type"),
        transform(sequence(lit(0), lit(alignDims - 1)), i =>
          (conv(substring(md5(concat(col("content_md5"), lit(":"),
            i.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long")
            % 2001 - 1000).cast("double") / 1000.0).as("mv"))
    val text = Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id").as("doc_id"),
        slice(col("embedding"), 1, alignDims).cast("array<double>").as("tv"))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    graft.Present.sortSmall(
      media.join(text, "doc_id")
        .withColumn("align_score",
          round(dot(col("mv"), col("tv")) /
            (sqrt(dot(col("mv"), col("mv"))) * sqrt(dot(col("tv"), col("tv")))), 4))
        .select(col("doc_id"), col("media_type"), col("align_score"),
          (col("align_score") >= alignThreshold).as("kept")),
      col("doc_id"))
  }

  /** DuckDB twin of [[mediaTextAlign]]: same stub vector arithmetic,
    * same truncated-text-embedding cosine, same threshold.
    */
  val mediaTextAlignSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 3 = 0 THEN 'image'
       |              WHEN doc_id % 3 = 1 THEN 'audio'
       |              ELSE 'video' END AS media_type,
       |         list_transform(range($alignDims), i ->
       |           ((('0x' || substr(md5(md5(text) || ':' || i), 1, 8))::BIGINT
       |             % 2001) - 1000) / 1000.0) AS mv
       |  FROM documents),
       |e AS (SELECT vec_id AS doc_id,
       |             list_transform(embedding[1:$alignDims], v -> CAST(v AS DOUBLE)) AS tv
       |      FROM embeddings),
       |j AS (SELECT m.doc_id, m.media_type,
       |             list_sum(list_transform(range($alignDims),
       |               i -> mv[i + 1] * tv[i + 1])) /
       |             (sqrt(list_sum(list_transform(mv, x -> x * x))) *
       |              sqrt(list_sum(list_transform(tv, x -> x * x)))) AS s
       |      FROM m JOIN e ON m.doc_id = e.doc_id)
       |SELECT doc_id, media_type, round(s, 4) AS align_score,
       |       round(s, 4) >= $alignThreshold AS kept
       |FROM j
       |ORDER BY doc_id""".stripMargin

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
