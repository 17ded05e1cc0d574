package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Text}
import graft.functions.HashFunctions._

/** Dev probe: stage-by-stage timing of the minhash pipeline. */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build()
    val sf = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val docsRaw = Tables.table(spark, sf, "documents")
    time("raw count")(docsRaw.count())
    val sh = docsRaw.select(col("doc_id"), Dedup.shingles(Text.tokens(col("text"))).as("s"))
    time("shingles only")(sh.count())
    time("shingles forced")(sh.select(explode(col("s"))).count())
    val sig = sh.select(col("doc_id"), minhash_signature(col("s"), 32).as("sig"))
    time("minhash sig")(sig.select(explode(col("sig"))).count())
    val hs = sh.select(col("doc_id"),
      array_sort(array_distinct(transform(col("s"), x => xxhash64(x)))).as("hs"))
    time("hashed shingles")(hs.select(explode(col("hs"))).count())
    time("full query cold")(SparkEntry.queries("x_dedup_minhash_lsh")(spark, sf).count())
    time("full query warm")(SparkEntry.queries("x_dedup_minhash_lsh")(spark, sf).count())
    spark.stop()
  }
}
