package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over float-array columns.
  *
  * Why a custom Catalyst Expression: the composable alternative
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) runs the higher-order
  * lambda interpreter per element — ~50× slower and allocating per row.
  * This expression generates a tight fused loop inside whole-stage
  * codegen, keeping 100 TB ANN scans compute-bound instead of
  * interpreter-bound.
  *
  * Semantics: Σ (double)a(i)·(double)b(i), sequential fold in element
  * order — bit-identical to the interpreted formulation and to DuckDB's
  * list_inner_product on DOUBLE[] casts (same IEEE op order), which the
  * oracle queries rely on.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // analysis-time type guard: getFloat on a non-float array would read
  // bit-garbage silently
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<float> inputs, got $l and $r")
    }

  // static schema fact: when neither input can hold null elements the
  // per-element null checks are omitted entirely (both paths)
  private lazy val elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType.asInstanceOf[ArrayType].containsNull)

  // length mismatch → null (matches the zip_with reference formulation,
  // where the padded null poisons the fold); a null ELEMENT also
  // poisons the whole dot to null (zip_with: null·x = null, and a null
  // term nulls the aggregate fold) — never a silently-perturbed
  // "plausible" score
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (elementsNullable) {
      var j = 0
      while (j < n) {
        if (x.isNullAt(j) || y.isNullAt(j)) return null
        j += 1
      }
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      // SEPARATE null-scan loop: a branch inside the FP-accumulate loop
      // costs 1.7-3× (measured on the ANN queries — it defeats the
      // JIT's pipelining of the multiply chain); a standalone
      // fully-predictable scan is near-free
      val nullElementScan =
        if (elementsNullable)
          s"""
             |for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
             |  ${ev.isNull} = $a.isNullAt($j) || $b.isNullAt($j);
             |}
           """.stripMargin
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullElementScan
         |  if (!${ev.isNull}) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |    }
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level helpers for the native vector ops. */
object VectorFunctions {

  /** Native codegen'd float-array dot product. */
  def vec_dot(a: Column, b: Column): Column =
    GraftBridge.column(
      FloatVecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Cosine from the native dot (same formula shape as the oracle:
    * dot / (sqrt(na) · sqrt(nb))).
    */
  def vec_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))
  }
}
