package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4's
  * Column wraps a ColumnNode; classic.ExpressionUtils does the
  * translation but is sql-private). Lives in the spark.sql package
  * solely to re-export those two calls for graft's custom expressions.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Fully-resolved catalyst expression for `c` bound to `df`'s analyzed
    * plan attributes. `expression()` alone returns a lazy
    * ColumnNodeExpression wrapper that custom logical nodes never get
    * converted/resolved (the Dataset API converts nodes per-operation,
    * not via an analyzer rule) — so a custom plan must resolve its
    * expressions itself, by round-tripping through a select.
    */
  def resolvedExpression(df: DataFrame, c: Column): catalyst.expressions.Expression =
    df.select(c).queryExecution.analyzed match {
      case p: catalyst.plans.logical.Project => p.projectList.head match {
        case a: catalyst.expressions.Alias => a.child
        case e => e
      }
      case other => throw new IllegalArgumentException(s"unexpected plan: $other")
    }

  /** Resolved catalyst SortOrder from a Column (handles `.desc`/`.asc`;
    * rebuilt with catalyst enums — the internal ColumnNode sort enums
    * are not Serializable and must not leak into SparkPlan closures).
    */
  def resolvedSortOrder(df: DataFrame, c: Column): catalyst.expressions.SortOrder = c.node match {
    case so: internal.SortOrder =>
      val dir = so.sortDirection match {
        case internal.SortOrder.Descending => catalyst.expressions.Descending
        case _ => catalyst.expressions.Ascending
      }
      val no = so.nullOrdering match {
        case internal.SortOrder.NullsFirst => catalyst.expressions.NullsFirst
        case _ => catalyst.expressions.NullsLast
      }
      catalyst.expressions.SortOrder(
        resolvedExpression(df, new Column(so.child)), dir, no, Seq.empty)
    case _ =>
      catalyst.expressions.SortOrder(
        resolvedExpression(df, c), catalyst.expressions.Ascending)
  }

  /** The ANALYZED plan — custom nodes built on this have stable
    * attribute ids matching expressions from [[resolvedExpression]].
    */
  def logicalPlan(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Error-classed long-SUM overflow (ARITHMETIC_OVERFLOW with the
    * try_sum hint) — the pushed aggregate's ANSI failure must surface
    * with the same error class as the row scan's `Sum` would raise,
    * not a bare ArithmeticException (`QueryExecutionErrors` is
    * sql-private, hence this re-export).
    */
  def longSumOverflow(): ArithmeticException =
    errors.QueryExecutionErrors.arithmeticOverflowError("long overflow", "try_sum")
}
