package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources._

/** Translate DataSource v1 [[Filter]] trees back into [[Column]]
  * expressions — the bridge that lets the `graft-upsert` table execute
  * SQL `DELETE FROM` conditions through its own copy-on-write rewrite
  * ([[ParquetUpsertSink.delete]]): Spark hands the parsed WHERE clause
  * to [[org.apache.spark.sql.connector.catalog.SupportsDelete]] as a
  * filter array, and the rewrite needs it as a DataFrame predicate.
  *
  * Total over every filter shape Spark produces for the flat column
  * set this table format stores; `translate` returns None for an
  * untranslatable node so `canDeleteWhere` can refuse (Spark then
  * reports the unsupported condition instead of mis-deleting).
  */
object FilterColumns {

  private def ref(a: String): Column = col(s"`$a`")

  /** One filter → predicate Column; None if any node is untranslatable. */
  def translate(f: Filter): Option[Column] = f match {
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case EqualTo(a, v) => Some(ref(a) === lit(v))
    case EqualNullSafe(a, v) => Some(ref(a) <=> lit(v))
    case GreaterThan(a, v) => Some(ref(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(ref(a) >= lit(v))
    case LessThan(a, v) => Some(ref(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(ref(a) <= lit(v))
    case In(a, vs) => Some(ref(a).isin(vs.toIndexedSeq.map(lit(_)): _*))
    case IsNull(a) => Some(ref(a).isNull)
    case IsNotNull(a) => Some(ref(a).isNotNull)
    case StringStartsWith(a, v) => Some(ref(a).startsWith(v))
    case StringEndsWith(a, v) => Some(ref(a).endsWith(v))
    case StringContains(a, v) => Some(ref(a).contains(v))
    case And(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case Or(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case Not(c) => translate(c).map(not)
    case _ => None
  }

  /** Conjunction of a pushed-filter array (empty = TRUE, the contract
    * Spark's delete path uses); None if any member is untranslatable.
    */
  def conjunction(filters: Array[Filter]): Option[Column] = {
    val cols = filters.map(translate)
    if (cols.exists(_.isEmpty)) None
    else Some(cols.flatten.reduceOption(_ && _).getOrElse(lit(true)))
  }
}
