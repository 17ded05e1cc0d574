package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `explain("formatted")` for SELECTED queries to
  * per-query files — the evidence format the optimization rounds
  * commit under plans/rN/ (`<query>_<suffix>.txt`).
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> <query>[,<query>...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <query>[,<query>...]")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = GraftSession.build("local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      val p = Paths.get(outDir, s"${name}_$suffix.txt")
      Files.writeString(p, plan)
      println(s"wrote $p")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
