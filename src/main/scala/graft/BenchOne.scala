package graft

/** Dev tool: time individual queries by name (warm run after a cold
  * run), e.g. `BenchOne x_dedup_minhash_lsh q_cdc_parse`.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build()
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n0 = fn(spark, sfDir).queryExecution.toRdd.count() // same methodology as Bench
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"$name: cold $cold%.2f s, warm $warm%.2f s, rows $n0")
    }
    spark.stop()
  }
}
