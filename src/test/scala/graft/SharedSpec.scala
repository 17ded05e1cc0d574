package graft

import org.apache.spark.sql.functions._

/** Contract of [[graft.ext.Shared.memo]]: one materialization per
  * (session, sfDir, key), stable results across catalog cache clears,
  * and key isolation.
  */
class SharedSpec extends SparkSpec {

  test("memo returns the same relation instance per key and isolates keys") {
    val a1 = ext.Shared.memo(spark, sf0001, "shared_spec_a") {
      spark.range(10).toDF("v")
    }
    val a2 = ext.Shared.memo(spark, sf0001, "shared_spec_a") {
      // build block must NOT run again — a different frame here would
      // surface as a 20-row result below
      spark.range(20).toDF("v")
    }
    assert(a1 eq a2, "same key must return the memoized instance")
    assert(a2.count() === 10)
    val b = ext.Shared.memo(spark, sf0001, "shared_spec_b") {
      spark.range(3).toDF("v")
    }
    assert(b.count() === 3)
    val other = ext.Shared.memo(spark, "/some/other/sf", "shared_spec_a") {
      spark.range(7).toDF("v")
    }
    assert(other.count() === 7, "different sfDir must rebuild")
  }

  test("memoized relation survives catalog clearCache and recomputes identically") {
    val m = ext.Shared.memo(spark, sf0001, "shared_spec_c") {
      Tables.table(spark, sf0001, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
    }
    val before = m.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    spark.catalog.clearCache()
    System.gc()
    val after = m.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(before === after)
    assert(before.nonEmpty)
  }
}
