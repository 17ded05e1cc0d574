package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup.topKPerGroup

/** Custom TopKPerGroup operator: result equivalence with the window
  * formulation and the partial→exchange→final physical shape.
  */
class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("matches the row_number window formulation") {
    val orders = Tables.table(spark, sf0001, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val native = topKPerGroup(orders, Seq($"o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val windowed = orders.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == windowed)
    assert(native.nonEmpty)
  }

  test("plans as partial -> exchange -> final (partial top-k before the shuffle)") {
    val orders = Tables.table(spark, sf0001, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val plan = topKPerGroup(orders, Seq($"o_custkey"),
      Seq($"o_totalprice".desc), 3).queryExecution.executedPlan.toString
    // exec nodes print with the Exec suffix stripped
    assert("TopKPerGroup \\[".r.findAllIn(plan).length == 2, s"want partial+final:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), s"missing exchange:\n$plan")
  }

  test("handles ties, small groups, and k larger than group size") {
    val df = Seq((1, 10, 5.0), (1, 11, 5.0), (1, 12, 5.0), (1, 13, 4.0), (2, 20, 1.0))
      .toDF("g", "id", "score")
    val out = topKPerGroup(df, Seq($"g"), Seq($"score".desc, $"id".asc), 3)
      .orderBy($"g", $"id").collect().map(r => (r.getInt(0), r.getInt(1)))
    // group 1: ties on score → id ascending wins; group 2: fewer than k rows
    assert(out.toSeq == Seq((1, 10), (1, 11), (1, 12), (2, 20)))
  }
}
