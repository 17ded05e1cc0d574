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
}
