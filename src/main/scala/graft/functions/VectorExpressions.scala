package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

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

/** Integer dot product over int-array columns (quantized embeddings).
  * Accumulates in long — |q|≤127 per component keeps any realistic
  * dimension count exact (127²·dim ≪ 2⁶³) — so the ADC candidate score
  * is integer-exact and cross-engine deterministic, unlike a float
  * fold. Null/length semantics mirror [[FloatVecDot]].
  */
case class IntVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int_vec_dot requires two array<int> inputs, got $l and $r")
    }

  private lazy val elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType.asInstanceOf[ArrayType].containsNull)

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
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getInt(i).toLong * y.getInt(i).toLong
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
         |    long $acc = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
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

/** Static per-row kernels shared by interpreted eval and generated
  * code (see HashKernels for the pattern rationale).
  */
object VectorKernels {

  /** numBands LSH band keys of a float vector against a flattened
    * (row-major) ±1 hyperplane matrix: band b's key packs the sign bits
    * of planes [b·bandBits, (b+1)·bandBits) in its low bits, with b in
    * the bits above — so keys from different bands never collide and a
    * single hash join on the key covers all bands. Dots run in element
    * order (same IEEE order as FloatVecDot / DuckDB's
    * list_inner_product, which the oracle twin relies on).
    *
    * Returns null on length mismatch or a null element, like
    * FloatVecDot — never a silently-perturbed bucket.
    */
  def hyperplaneBandKeys(v: ArrayData, planes: Array[Double], dim: Int,
      bandBits: Int): ArrayData = {
    if (v.numElements() != dim) return null
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      j += 1
    }
    val numPlanes = planes.length / dim
    val numBands = numPlanes / bandBits
    val keys = new Array[Long](numBands)
    var p = 0
    while (p < numPlanes) {
      val off = p * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        acc += v.getFloat(i).toDouble * planes(off + i)
        i += 1
      }
      if (acc > 0) keys(p / bandBits) |= 1L << (p % bandBits)
      p += 1
    }
    var b = 0
    while (b < numBands) { keys(b) |= b.toLong << bandBits; b += 1 }
    new GenericArrayData(keys)
  }
}

/** All LSH band keys of an embedding in ONE pass over a constant plane
  * matrix — replaces a projection of numPlanes separate literal-array
  * dot expressions (whose generated code grows past JIT limits and
  * deoptimizes). planesFlat is an IndexedSeq so the case-class equality
  * Catalyst uses for plan canonicalization stays structural.
  */
case class HyperplaneBandKeys(child: Expression, planesFlat: IndexedSeq[Double],
    dim: Int, bandBits: Int) extends UnaryExpression {

  require(dim > 0 && bandBits > 0 && planesFlat.nonEmpty
    && planesFlat.size % (dim * bandBits) == 0,
    s"planesFlat size ${planesFlat.size} must be a multiple of dim·bandBits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_band_keys requires array<float> input, got $t")
  }

  @transient private lazy val planesArr: Array[Double] = planesFlat.toArray

  override def nullSafeEval(input: Any): Any =
    VectorKernels.hyperplaneBandKeys(
      input.asInstanceOf[ArrayData], planesArr, dim, bandBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("bandPlanes", planesArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.VectorKernels.hyperplaneBandKeys(
       |  $c, $planesRef, $dim, $bandBits);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level helpers for the native vector ops. */
object VectorFunctions {

  /** Native codegen'd float-array dot product. */
  def vec_dot(a: Column, b: Column): Column =
    GraftBridge.column(
      FloatVecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Native codegen'd int-array dot product (exact, long-accumulated). */
  def int_vec_dot(a: Column, b: Column): Column =
    GraftBridge.column(
      IntVecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Cosine from the native dot (same formula shape as the oracle:
    * dot / (sqrt(na) · sqrt(nb))).
    */
  def vec_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))
  }

  /** All LSH band keys of an embedding in one native pass. */
  def hyperplane_band_keys(v: Column, planesFlat: IndexedSeq[Double],
      dim: Int, bandBits: Int): Column =
    GraftBridge.column(
      HyperplaneBandKeys(GraftBridge.expression(v), planesFlat, dim, bandBits))
}
