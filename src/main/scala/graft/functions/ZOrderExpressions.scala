package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * At 100 TB the dominant cost of a selective query is the scan, and
  * the scan is pruned by per-file min/max statistics. A 1-D sort makes
  * those statistics selective in ONE column; writing files clustered on
  * the Z-order of two filter columns keeps BOTH columns' per-file
  * ranges tight (each Z-prefix bucket is a 2-D tile), so either
  * predicate skips files — the Delta/Iceberg `OPTIMIZE ZORDER BY` move,
  * here as a first-class codegen'd expression the writer can
  * `repartitionByRange`/`sortWithinPartitions` on.
  */
object ZOrderKernels {

  /** Spread the low 31 bits of v to the even bit positions — the
    * branch-free shift-mask chain (5 steps, no loop).
    */
  def spreadBits(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 62-bit Morton code: x occupies even bits, y odd bits. Inputs are
    * masked to 31 bits so the result never touches the sign bit —
    * Z-value order is then plain long order.
    */
  def morton(x: Long, y: Long): Long =
    spreadBits(x) | (spreadBits(y) << 1)
}

/** `morton_code(x, y)` — interleave two non-negative longs bit by bit.
  * Stays inside whole-stage codegen via a static kernel call.
  */
case class MortonCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"morton_code requires (bigint, bigint) input, got ($l, $r)")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKernels.morton(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZOrderKernels.morton($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpressions {

  /** Column-API wrapper for [[MortonCode]]. */
  def mortonCode(x: Column, y: Column): Column =
    GraftBridge.column(
      MortonCode(GraftBridge.expression(x), GraftBridge.expression(y)))

  /** DuckDB twin of [[ZOrderKernels.spreadBits]] over the SQL
    * expression `v`: the same shift-mask chain, emitted as sequential
    * lateral aliases by [[spreadSqlSteps]].
    */
  val spreadMasks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** SELECT-list steps computing spread(`v`) into alias `out` via
    * DuckDB lateral column references (each step names the previous
    * alias once — no exponential expression blow-up).
    */
  def spreadSqlSteps(v: String, prefix: String, out: String): String = {
    val first = s"($v) & 2147483647 AS ${prefix}0"
    val steps = spreadMasks.zipWithIndex.map { case ((sh, mask), i) =>
      val prev = s"$prefix$i"
      val name = if (i == spreadMasks.size - 1) out else s"$prefix${i + 1}"
      s"($prev | ($prev << $sh)) & $mask AS $name"
    }
    (first +: steps).mkString(",\n       ")
  }
}
