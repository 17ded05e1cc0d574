package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both fact tables on the join
  * key lets the join run with ZERO exchanges — the 100 TB answer to
  * repeated fact-fact joins (pay the shuffle once at write time).
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs without a shuffle exchange") {
    // explicit per-table paths — warehouse.dir is a static conf
    val wh = Files.createTempDirectory("graft_wh").toString
    val orders = Tables.table(spark, sf0001, "orders")
    val lineitem = Tables.table(spark, sf0001, "lineitem")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce an exchange; only the final
      // aggregation exchanges (on o_orderstatus)
      val joinPart = plan.split("HashAggregate").last // below the partial agg
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"),
        s"unexpected join-side exchange in plan:\n$plan")
      assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"unexpected join-side exchange in plan:\n$plan")
      // and the result is correct vs the plain join
      val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
