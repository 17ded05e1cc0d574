package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic presentation sort for BOUNDED results (aggregates,
  * top-k, near-dup pair lists): shuffle the final rows to one partition
  * and sort there — the same shape Spark itself picks for
  * TakeOrderedAndProject.
  *
  * Why not `orderBy`: a global sort range-partitions, and the range
  * partitioner's sampling pass re-executes the ENTIRE child plan —
  * for a query whose upstream is the expensive part and whose result
  * is small, that doubles the query. The heavy upstream keeps its full
  * parallelism; only the final (small) result crosses one exchange.
  *
  * Use `orderBy` instead when the result itself is unbounded at scale
  * (row-level transforms), where a single-partition sort would not
  * survive 100 TB — there, sort as early as possible (see
  * Parity.cdcParse) so the sampler re-executes only a cheap prefix.
  */
object Present {
  def sortSmall(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
