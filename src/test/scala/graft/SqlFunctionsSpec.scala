package graft

import org.apache.spark.sql.functions._

/** The SQL surface of the custom expressions/aggregates: every function
  * GraftExtensions registers must be reachable from `spark.sql` and
  * agree with its Column-API twin.
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered scalar functions run from spark.sql and match the Column API") {
    Tables.table(spark, sf0001, "embeddings").createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      """SELECT a.vec_id,
        |       graft_vec_dot(a.embedding, a.embedding) AS self_dot
        |FROM emb_sql a ORDER BY a.vec_id""".stripMargin)
      .as[(Long, Double)].collect()
    val viaCol = Tables.table(spark, sf0001, "embeddings")
      .select($"vec_id",
        graft.functions.VectorFunctions.vec_dot($"embedding", $"embedding").as("d"))
      .orderBy($"vec_id").as[(Long, Double)].collect()
    assert(viaSql.toSeq == viaCol.toSeq)

    val sh = spark.sql(
      "SELECT graft_word_shingles(array('a','b','c','d'), 3) AS s")
      .as[Seq[String]].collect()(0)
    assert(sh.toSet == Set("a b c", "b c d"))

    val mz = spark.sql("SELECT graft_morton_code(3, 5) AS z").as[Long].collect()(0)
    assert(mz == functions.ZOrderKernels.morton(3L, 5L))
    assert(mz == 39L) // x=011 -> even bits 0,2; y=101 -> odd bits 1,5: 100111
  }

  test("registered hash/sketch scalars agree with their Column-API twins on the corpus") {
    import graft.functions.HashFunctions._
    Tables.table(spark, sf0001, "documents").createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |       graft_simhash(split(text, ' '), 60) AS sh,
        |       graft_top_ngram_frac(split(text, ' '), 3) AS frac,
        |       graft_sorted_intersect_count(
        |         graft_hashed_shingle_set(split(text, ' '), 3),
        |         graft_hashed_shingle_set(split(text, ' '), 3)) AS self_n,
        |       graft_minhash_signature(
        |         graft_word_shingles(split(text, ' '), 3), 8) AS sig
        |FROM docs_sql ORDER BY doc_id""".stripMargin)
      .as[(Long, Long, Double, Int, Seq[Long])].collect()
    val t = split(col("text"), " ")
    val viaCol = Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"),
        simhash_md5(t, 60).as("sh"),
        top_ngram_frac(t, 3).as("frac"),
        sorted_intersect_count(
          hashed_shingle_set(t, 3), hashed_shingle_set(t, 3)).as("self_n"),
        minhash_signature(word_shingles(t, 3), 8).as("sig"))
      .orderBy(col("doc_id"))
      .as[(Long, Long, Double, Int, Seq[Long])].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("registered aggregates run from spark.sql and match the Column API") {
    Tables.table(spark, sf0001, "events").createOrReplaceTempView("ev_sql")
    // un-suffixed decimal literals (the way a SQL user writes them)
    val viaSql = spark.sql(
      """SELECT event_type,
        |       graft_exact_count_distinct(user_id) AS uniq,
        |       graft_dd_quantiles(value, 1.02, 0.5, 0.99) AS qv
        |FROM ev_sql GROUP BY event_type ORDER BY event_type""".stripMargin)
      .as[(String, Long, Seq[Double])].collect()
    val viaCol = Tables.table(spark, sf0001, "events")
      .groupBy($"event_type")
      .agg(
        graft.functions.AggregateFunctions.exact_count_distinct($"user_id").as("uniq"),
        graft.functions.AggregateFunctions.dd_quantiles($"value", 1.02, Seq(0.5, 0.99)).as("qv"))
      .orderBy($"event_type").as[(String, Long, Seq[Double])].collect()
    assert(viaSql.toSeq == viaCol.toSeq)

    val viaSql2 = spark.sql(
      """SELECT graft_bounded_collect_set(event_type, 3) AS s,
        |       graft_misra_gries(event_type, 2) AS mg
        |FROM ev_sql""".stripMargin)
      .as[(Seq[String], Seq[String])].collect()(0)
    val viaCol2 = Tables.table(spark, sf0001, "events")
      .agg(
        graft.functions.AggregateFunctions.bounded_collect_set($"event_type", 3).as("s"),
        graft.functions.AggregateFunctions.misra_gries($"event_type", 2).as("mg"))
      .as[(Seq[String], Seq[String])].collect()(0)
    assert(viaSql2 == viaCol2)
  }

  test("sketch parameters reject non-literal arguments with a clear error") {
    Tables.table(spark, sf0001, "events").createOrReplaceTempView("ev_sql2")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_dd_quantiles(value, value, 0.5D) FROM ev_sql2").collect()
    }
    assert(e.getMessage.contains("numeric literal"))
  }
}
