package graft

/** Triage main for the PQ-ANN stage decomposition (SCALING.md): runs
  * [[ext.Similarity.pqStageWalls]] against `SPARK_GRAFT_SF_DIR` and
  * prints one `stage wall_sec rows` line per stage plus a JSON tail.
  * Run on an idle box (bench-variance protocol applies).
  */
object PqStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build()
    val walls = ext.Similarity.pqStageWalls(spark, sfDir)
    walls.foreach { case (n, w, rows) =>
      System.err.println(f"[pq-stage] $n%-18s ${w}%8.3f s  $rows%9d rows")
    }
    // JSON string escape for the interpolated path (same bug class the
    // r17 advisory fixed in Bench.scala — sfDir comes from an env var)
    def esc(x: String): String = x.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val js = walls.map { case (n, w, rows) =>
      s"""{"stage":"${esc(n)}","sec":${math.round(w * 1000) / 1000.0},"rows":$rows}"""
    }.mkString("[", ",", "]")
    spark.stop()
    println(s"""{"metric":"pq_stages","sf":"${esc(sfDir)}","stages":$js}""")
  }
}
