package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic presentation sort for gate/bench query results:
  * shuffle the final rows to one partition and sort there — the same
  * shape Spark itself picks for TakeOrderedAndProject.
  *
  * Why not `orderBy`: a global sort range-partitions, and the range
  * partitioner's sampling pass re-executes the ENTIRE child plan — for
  * a query whose upstream is the expensive part, that runs the query
  * twice. The heavy upstream keeps its full parallelism; only the
  * final result crosses one exchange.
  *
  * Scale note: this is presentation-layer scaffolding for the
  * deterministic oracle compare (results at gate scale are ≤100k
  * rows). The library operators themselves never impose a total order
  * — a 100 TB pipeline writes unsorted (or range-partitions explicitly
  * when a consumer demands global order and the 2× sampling pass is
  * worth paying).
  */
object Present {
  def sortSmall(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
