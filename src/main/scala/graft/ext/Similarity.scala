package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Present, Tables}
import graft.functions.VectorFunctions.{vec_cosine, vec_dot}

/** Similarity search over an embedding column (Array[Float], dim 64).
  *
  *  - brute-force cosine top-k: the exact baseline. Queries are
  *    broadcast; the corpus side streams — one pass, no shuffle of the
  *    big side. At 100 TB the corpus scan is embarrassingly parallel and
  *    top-k per query aggregates via partial TakeOrdered.
  *  - random-hyperplane LSH buckets: the approximate scale path. Each
  *    vector maps to an 8-bit bucket (sign pattern against 8 fixed
  *    hyperplanes); search touches only the query's bucket — candidate
  *    set shrinks ~256× at constant recall for high-similarity pairs.
  *
  * Hyperplanes are deterministic (md5-derived ±1 components) so the
  * DuckDB oracle reproduces them bit-for-bit from the same literals.
  */
object Similarity {

  val dim = 64
  val numPlanes = 8

  /** md5-hex of a string — matches DuckDB's md5(). */
  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** ±1 hyperplane components, derived exactly like the SQL twin:
    * ('0x' || substr(md5(p || ':' || i), 1, 8))::BIGINT % 2.
    */
  val planeSigns: IndexedSeq[IndexedSeq[Double]] =
    (0 until numPlanes).map { p =>
      (0 until dim).map { i =>
        val v = java.lang.Long.parseLong(md5Hex(s"$p:$i").take(8), 16)
        if (v % 2 == 1) 1.0 else -1.0
      }
    }

  /** Native codegen'd dot / cosine (graft.functions.FloatVecDot) —
    * identical IEEE op order to the oracle's list_inner_product on
    * DOUBLE[] casts.
    */
  def dot(a: Column, b: Column): Column = vec_dot(a, b)

  def cosine(a: Column, b: Column): Column = vec_cosine(a, b)

  /** SQL twin of [[cosine]] — same formula shape (dot / (sqrt·sqrt)),
    * computed on DOUBLE[] casts.
    */
  def cosineSql(a: String, b: String): String =
    s"(list_inner_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))" +
      s" / (sqrt(list_inner_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])))" +
      s" * sqrt(list_inner_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[])))))"

  // ——— brute-force top-k ———

  /** Exact cosine top-5 neighbors for every 100th vector. */
  def annBruteForce(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    // re-split the single-file scan: the corpus streams through the
    // broadcast loop, so its partition count IS the parallelism
    val corpus = emb.repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("nv")), 4))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    Present.sortSmall(
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank")),
      col("query_id"), col("rank"))
  }

  val annBruteForceSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |           WHERE vec_id % 100 = 0),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         round(${cosineSql("q.qv", "e.embedding")}, 4) AS sim
       |  FROM q, embeddings e WHERE e.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, sim, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  // ——— near-duplicate pairs by cosine ———

  /** All vector pairs with cosine ≥ 0.4 (corpus max is ~0.51 — these
    * are the planted near-dups). Brute force here; the LSH variant
    * below is the scale path.
    */
  def embeddingPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // norms computed once per vector (not per pair): sim = dot/(na*nb)
    // is bit-identical to dot/(sqrt(daa)*sqrt(dbb)) — same op order.
    val emb = Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        sqrt(vec_dot(col("embedding"), col("embedding"))).as("nrm"))
    // the corpus parquet is one small file = ONE input partition; the
    // nested-loop probe side must be re-split or the whole O(n²) pair
    // loop runs on a single core
    val a = emb.repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id").as("vec_a"), col("embedding").as("va"), col("nrm").as("na"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("vb"), col("nrm").as("nb"))
    // NOTE: the optimizer pushes the sim filter below into the BNLJ
    // join condition, so the dot runs on the interpreted row path per
    // ordered pair. For a PAIR-VALUED result there is no clean way to
    // keep it out (dedupByEmbedding's conditional-aggregate trick needs
    // an aggregated output); measured acceptable at this scale once the
    // probe side is properly parallelized.
    Present.sortSmall(
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("sim", round(vec_dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
        .filter(col("sim") >= 0.4)
        .select(col("vec_a"), col("vec_b"), col("sim")),
      col("vec_a"), col("vec_b"))
  }

  val embeddingPairsSql: String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(${cosineSql("a.embedding", "b.embedding")}, 4) AS sim
       |FROM embeddings a, embeddings b
       |WHERE a.vec_id < b.vec_id
       |  AND round(${cosineSql("a.embedding", "b.embedding")}, 4) >= 0.4
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Embedding-cosine near-dup DEDUP decision layer: every vector that
    * has a neighbor with a smaller id at sim ≥ 0.4 is a duplicate; its
    * keeper is the smallest such neighbor. Naive all-pairs baseline,
    * capped at vec_id < 2000 like the n-gram Jaccard baseline — the
    * LSH/IVF bucketing above is the 100 TB candidate-generation path.
    */
  def dedupByEmbedding(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.table(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 2000)
      .select(col("vec_id"), col("embedding"),
        sqrt(vec_dot(col("embedding"), col("embedding"))).as("nrm"))
    // re-split the single-file scan so the pair loop parallelizes (see
    // embeddingPairs)
    val a = emb.repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id").as("vec_a"), col("embedding").as("va"), col("nrm").as("na"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("vb"), col("nrm").as("nb"))
    // the threshold lives in CONDITIONAL AGGREGATES, not a filter: a
    // post-join filter on sim gets pushed into the nested-loop join
    // condition, where the 64-wide dot runs on the interpreted row path
    // for every ordered pair — measured 2.5× slower than streaming all
    // pairs through the codegen'd projection below
    val passingA = when(col("sim") >= 0.4, col("vec_a"))
    Present.sortSmall(
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("sim", round(vec_dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
        .select(col("vec_a"), col("vec_b"), col("sim"))
        .groupBy(col("vec_b").as("dup_id"))
        .agg(
          min(passingA).as("keeper_id"),
          count(passingA).as("n_near_dups"),
          max(when(col("sim") >= 0.4, col("sim"))).as("best_sim"))
        .filter(col("n_near_dups") > 0),
      col("dup_id"))
  }

  val dedupByEmbeddingSql: String =
    s"""WITH pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         round(${cosineSql("a.embedding", "b.embedding")}, 4) AS sim
       |  FROM embeddings a, embeddings b
       |  WHERE a.vec_id < b.vec_id AND a.vec_id < 2000 AND b.vec_id < 2000
       |    AND round(${cosineSql("a.embedding", "b.embedding")}, 4) >= 0.4)
       |SELECT vec_b AS dup_id,
       |       min(vec_a) AS keeper_id,
       |       count(*) AS n_near_dups,
       |       max(sim) AS best_sim
       |FROM pairs
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  // ——— LSH-bucketed ANN ———

  /** Literal ±1 array column for plane p. */
  private def planeCol(p: Int): Column =
    array(planeSigns(p).map(v => lit(v.toFloat)): _*)

  /** 8-bit sign bucket of an embedding against the fixed hyperplanes. */
  def bucket(v: Column): Column =
    (0 until numPlanes).map { p =>
      when(dot(v, planeCol(p)) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN restricted to the query's LSH bucket: top-5 by cosine among
    * same-bucket vectors. Bucket assignment is one corpus pass; the
    * join is a hash join on bucket id.
    */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"), bucket(col("embedding")).as("bkt"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bkt"))
    val scored = emb.repartition(spark.sparkContext.defaultParallelism)
      .join(broadcast(queries), Seq("bkt"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("qv"), col("embedding")), 4))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    Present.sortSmall(
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("sim"), col("rank")),
      col("query_id"), col("rank"))
  }

  /** SQL literal for plane p's sign array. */
  private def planeSqlLit(p: Int): String =
    planeSigns(p).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  val annLshSql: String = {
    val bucketExpr = (0 until numPlanes).map { p =>
      s"(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), ${planeSqlLit(p)}) > 0" +
        s" THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH bucketed AS (
       |  SELECT vec_id, embedding, $bucketExpr AS bkt FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, bkt FROM bucketed
       |      WHERE vec_id % 100 = 0),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         round(${cosineSql("q.qv", "e.embedding")}, 4) AS sim
       |  FROM q JOIN bucketed e USING (bkt) WHERE e.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, sim, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  // ——— IVF-style ANN ———

  /** IVF coarse quantization with deterministic "centroids" (every 25th
    * vector serves as a cell seed — in production these come from a
    * KMeans fit; deterministic seeds keep the DuckDB oracle exact).
    * One pass assigns each vector to its nearest centroid (argmax
    * cosine, 20 broadcast centroids); search then touches only the
    * query's cell. nprobe=1 here; raising nprobe = union more cells.
    */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.table(spark, sfDir, "embeddings")
    val centroids = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    // nearest-centroid assignment via the native TopKPerGroup operator:
    // the exchange carries at most ONE (best-so-far) row per vector per
    // input partition, where a row_number window would shuffle and sort
    // the full |vectors| × |centroids| candidate set. The probe side is
    // re-split first — the quadratic cosine work now runs BEFORE the
    // exchange, on what would otherwise be the single-file scan's one
    // partition
    val scoredCand = emb.repartition(spark.sparkContext.defaultParallelism)
      .join(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        cosine(col("embedding"), col("cv")).as("cent_sim"))
    val cells = graft.plans.TopKPerGroup.topKPerGroup(
      scoredCand, Seq(col("vec_id")), Seq(col("cent_sim").desc, col("cent_id").asc), 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
      // referenced by both the query side and the probe side — persist
      // so the quadratic assignment runs once (Bench/Verify clearCache
      // between queries; library callers own the unpersist)
      .persist()
    // eager materialization: on a cold cache the broadcast build and
    // the probe scan otherwise race, each computing the full assignment
    cells.count()
    val queries = cells.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cent_id"))
    val scored = cells.join(broadcast(queries), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("qv"), col("embedding")), 4))
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    Present.sortSmall(
      scored
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("sim"), col("rank")),
      col("query_id"), col("rank"))
  }

  val annIvfSql: String =
    s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
       |              WHERE vec_id % 25 = 0),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY ${cosineSql("e.embedding", "c.cv")} DESC,
       |                                     c.cent_id) AS rn
       |  FROM embeddings e, cent c),
       |cells AS (SELECT vec_id, embedding, cent_id FROM assigned WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, cent_id FROM cells
       |      WHERE vec_id % 100 = 0),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         round(${cosineSql("q.qv", "e.embedding")}, 4) AS sim
       |  FROM q JOIN cells e USING (cent_id) WHERE e.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, sim, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
}
