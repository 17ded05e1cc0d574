package graft

/** Physical-plan shape guards: the scale properties the operator docs
  * promise (tiled hash join instead of a nested loop, broadcast on the
  * dimension side, native partial top-k) are asserted here so a plan
  * regression fails the build, not just the bench.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("embedding pair ops stay on the tiled hash join — no nested loop, no cartesian") {
    Seq("x_embedding_pairs", "x_dedup_embedding").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q regressed to BNLJ")
      assert(!p.contains("CartesianProduct"), s"$q regressed to cartesian")
    }
  }

  test("dimension joins broadcast the small side") {
    assert(plan("q_join_activity_employee").contains("BroadcastHashJoin"))
    assert(plan("q5_supplier_volume").contains("BroadcastHashJoin"))
  }

  test("top-k queries run on the native TopKPerGroup operator") {
    Seq("q_topk_native", "x_bm25", "x_tfidf").foreach { q =>
      assert(plan(q).contains("TopKPerGroup"), s"$q lost the native top-k")
    }
  }

  test("interval join stays banded — no cartesian pair space") {
    assert(!plan("q_interval_join").contains("CartesianProduct"))
    assert(!plan("q_interval_join").contains("BroadcastNestedLoopJoin"))
  }
}
