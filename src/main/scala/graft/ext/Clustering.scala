package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Present, Tables}

/** Distributed k-means (Lloyd) over the embedding corpus — the
  * clustering stage of corpus curation (topic balancing, diversity
  * sampling, the production source of [[Similarity.annIvf]]'s
  * centroids).
  *
  * Each refinement iteration is the 100 TB shape:
  *  - assignment: broadcast the k centroids, argmax-cosine per vector
  *    via the native TopKPerGroup operator (the exchange carries one
  *    best-so-far row per vector per partition, never the |v|×k
  *    candidate set);
  *  - update: posexplode to (cent, dim, value) → partial-agged avg per
  *    (cent, dim) — a k×dim-cell aggregation, shuffle size k·dim
  *    regardless of corpus size — → rebuild the centroid arrays.
  *
  * Cross-engine determinism: seeds are the same deterministic every-Nth
  * scheme as IVF; updated centroid components are cast to FLOAT, whose
  * 2^-24 rounding absorbs the ~2^-50 relative wobble of distributed
  * double summation order, so the DuckDB twin (chained CTE iterations)
  * reproduces the refinement bit-for-bit. Ties in assignment break by
  * cent_id, as in IVF.
  */
object Clustering {

  val iterations = 2

  /** One assignment pass: (vec_id, embedding, cent_id, sim) against a
    * broadcast centroid set (cent_id, cv).
    */
  private def assign(vectors: DataFrame, cents: DataFrame): DataFrame =
    graft.plans.TopKPerGroup.topKPerGroup(
      vectors.join(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cent_id"),
          Similarity.cosine(col("embedding"), col("cv")).as("sim")),
      Seq(col("vec_id")), Seq(col("sim").desc, col("cent_id").asc), 1)

  /** Mean of the members per centroid, rebuilt as a float array in
    * dimension order.
    */
  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cent_id"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy(col("cent_id"), col("d"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("cent_id"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
        s => s.getField("m").cast("float")).as("cv"))

  /** k-means summary after [[iterations]] refinements: per final
    * cluster, its size and cohesion (mean member-to-centroid cosine).
    */
  def kmeans(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.table(spark, sfDir, "embeddings")
      // re-split the single-file scan so assignment parallelizes
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding"))
    var cents = Tables.table(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    for (_ <- 1 to iterations)
      cents = update(assign(emb, cents))
    Present.sortSmall(
      assign(emb, cents)
        .groupBy(col("cent_id"))
        .agg(count(lit(1)).as("n_members"),
          round(avg(col("sim")), 4).as("cohesion")),
      col("cent_id"))
  }

  /** DuckDB twin: the same seeds and two chained
    * assign→average→float-cast iterations as CTEs, then the final
    * assignment summary.
    */
  val kmeansSql: String = {
    def assignCte(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT vec_id, embedding, cent_id, sim FROM (
         |    SELECT e.vec_id, e.embedding, c.cent_id,
         |           ${Similarity.cosineSql("e.embedding", "c.cv")} AS sim,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${Similarity.cosineSql("e.embedding", "c.cv")} DESC,
         |                      c.cent_id) AS rn
         |    FROM embeddings e, $cents c)
         |  WHERE rn = 1)""".stripMargin
    s"""WITH cent0 AS (
       |  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
       |  WHERE vec_id % 25 = 0),
       |${assignCte("a1", "cent0")},
       |m1 AS (
       |  SELECT cent_id, d, avg(v) AS m FROM (
       |    SELECT cent_id, generate_subscripts(embedding, 1) AS d,
       |           unnest(embedding) AS v
       |    FROM a1) t
       |  GROUP BY cent_id, d),
       |cent1 AS (
       |  SELECT cent_id, list(CAST(m AS FLOAT4) ORDER BY d) AS cv
       |  FROM m1 GROUP BY cent_id),
       |${assignCte("a2", "cent1")},
       |m2 AS (
       |  SELECT cent_id, d, avg(v) AS m FROM (
       |    SELECT cent_id, generate_subscripts(embedding, 1) AS d,
       |           unnest(embedding) AS v
       |    FROM a2) t
       |  GROUP BY cent_id, d),
       |cent2 AS (
       |  SELECT cent_id, list(CAST(m AS FLOAT4) ORDER BY d) AS cv
       |  FROM m2 GROUP BY cent_id),
       |${assignCte("a3", "cent2")}
       |SELECT cent_id, count(*) AS n_members,
       |       round(avg(sim), 4) AS cohesion
       |FROM a3
       |GROUP BY cent_id
       |ORDER BY cent_id""".stripMargin
  }
}
