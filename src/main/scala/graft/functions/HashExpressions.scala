package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom expressions for the dedup operators — each replaces an
  * explode/shuffle pyramid or an allocating built-in with a single
  * per-row pass, which is what keeps these operators linear-cost at
  * 100 TB.
  *
  * Codegen strategy: the per-row logic lives in [[HashKernels]] as
  * static methods; `doGenCode` emits a direct static call. Unlike
  * `CodegenFallback` this keeps the expression INSIDE whole-stage
  * codegen — no fallback boundary, no per-row `InternalRow` boxing, and
  * the surrounding operators stay in one generated loop.
  */

/** Single-source per-row kernels, shared by the interpreted eval path
  * and the generated code (which calls them statically).
  */
object HashKernels {

  /** |a ∩ b| for two SORTED long arrays via merge scan. */
  def sortedIntersectCount(x: ArrayData, y: ArrayData): Int = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) { i += 1 }
      else if (y.isNullAt(j)) { j += 1 }
      else {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    c
  }

  /** k MinHash values (xxhash64, seed = hash index) in one pass. */
  def minhashSignature(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s == null) { i += 1 } else {
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var seed = 0
        while (seed < k) {
          val h = XXH64.hashUnsafeBytes(base, off, len, seed.toLong)
          if (h < sig(seed)) sig(seed) = h
          seed += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(token) as a long — numerically from the
    * digest bytes (60 bits: 7 full bytes + the high nibble of byte 7),
    * identical to parsing the formatted hex string but without the
    * per-token string allocation.
    */
  private def md5Head60(bytes: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(7) & 0xffL) >>> 4)
  }

  /** bits-wide SimHash of a (distinct) token array, md5-derived. */
  def simhashMd5(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    val digest = md.get()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { i += 1 } else {
        digest.reset()
        val v = md5Head60(digest.digest(arr.getUTF8String(i).getBytes))
        var b = 0
        while (b < bits) {
          if (((v >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** max n-gram frequency / total n-gram count of a token array —
    * the Gopher-style repetition signal. Returns -1.0 when the array
    * holds fewer than n tokens (the expression maps that to null).
    */
  def topNgramFrac(arr: ArrayData, n: Int): Double = {
    val total = arr.numElements() - n + 1
    if (total <= 0) return -1.0
    val counts = new java.util.HashMap[String, Integer]()
    var max = 0
    var i = 0
    while (i < total) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(tok(arr, i + k))
        k += 1
      }
      val c = counts.merge(sb.toString, Integer.valueOf(1), (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    max.toDouble / total
  }

  private def tok(arr: ArrayData, i: Int): String = {
    val u = arr.getUTF8String(i)
    if (u == null) "" else u.toString
  }

  /** Distinct n-word shingles, first-occurrence order. */
  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    if (len < n) {
      val sb = new StringBuilder
      var i = 0
      while (i < len) {
        if (i > 0) sb.append(' ')
        sb.append(tok(arr, i))
        i += 1
      }
      out.add(UTF8String.fromString(sb.toString))
    } else {
      var i = 0
      while (i <= len - n) {
        val sb = new StringBuilder
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(tok(arr, i + k))
          k += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    val res = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    new GenericArrayData(res)
  }

  /** Sorted distinct xxhash64 of the n-word shingles. */
  def hashedShingleSet(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val hs = new java.util.TreeSet[java.lang.Long]()
    def hashRange(start: Int, width: Int): Long = {
      val sb = new StringBuilder
      var k = 0
      while (k < width) {
        if (k > 0) sb.append(' ')
        val u = arr.getUTF8String(start + k)
        sb.append(if (u == null) "" else u.toString)
        k += 1
      }
      val u = UTF8String.fromString(sb.toString)
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
    }
    if (len < n) {
      if (len > 0) hs.add(hashRange(0, len))
    } else {
      var i = 0
      while (i <= len - n) { hs.add(hashRange(i, n)); i += 1 }
    }
    val res = new Array[Long](hs.size)
    val it = hs.iterator()
    var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    new GenericArrayData(res)
  }
}

/** |a ∩ b| for two SORTED long arrays via merge scan — no per-row set
  * allocation (array_intersect builds a hash set per invocation, which
  * dominates pairwise-Jaccard cost).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint> inputs, got $l and $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HashKernels.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** k MinHash values of a string array in one pass (xxhash64 with seed =
  * hash index). Replaces explode(shingles × seeds) → min-agg — i.e.
  * two shuffles and a k×|shingles| row blowup — with a projection.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, s"MinHashSignature k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string> input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSignature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.minhashSignature($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit SimHash of a (distinct) token array, md5-derived per token so
  * the DuckDB oracle reproduces it: token value =
  * first-15-hex-digits(md5(token)) as a long, bit votes ±1, majority
  * sign packs the bit. One pass per row — replaces the
  * explode(token × bit) double-aggregation.
  */
case class SimHashMd5(child: Expression, bits: Int)
    extends UnaryExpression {

  // token values carry 15 hex digits = 60 bits; more would silently
  // produce constant-zero high bits
  require(bits > 0 && bits <= 60, s"SimHashMd5 bits must be in [1,60], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_md5 requires array<string> input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashKernels.simhashMd5(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.simhashMd5($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedLongIntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))

  def minhash_signature(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingles), k))

  def simhash_md5(tokens: Column, bits: Int = 60): Column =
    GraftBridge.column(SimHashMd5(GraftBridge.expression(tokens), bits))

  def word_shingles(tokens: Column, n: Int = 3): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(tokens), n))

  def hashed_shingle_set(tokens: Column, n: Int = 3): Column =
    GraftBridge.column(HashedShingleSet(GraftBridge.expression(tokens), n))

  def top_ngram_frac(tokens: Column, n: Int): Column =
    GraftBridge.column(TopNgramFrac(GraftBridge.expression(tokens), n))
}

/** Fraction of a doc's n-grams taken by its single most frequent
  * n-gram — the Gopher-style repetition signal (repetitive boilerplate
  * and generation loops spike it). One native pass with a local count
  * map; null when the doc has fewer than n tokens. The composable
  * alternative (explode n-grams → per-doc groupBy → max/count) shuffles
  * every n-gram of the corpus; this keeps the quality gate per-row and
  * shuffle-free.
  */
case class TopNgramFrac(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"TopNgramFrac n must be positive, got $n")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_ngram_frac requires array<string> input, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val f = HashKernels.topNgramFrac(input.asInstanceOf[ArrayData], n)
    if (f < 0) null else java.lang.Double.valueOf(f)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.HashKernels.topNgramFrac($c, $n);
       |if (${ev.value} < 0) { ${ev.isNull} = true; ${ev.value} = 0.0; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct n-word shingles of a token array, built in one native pass
  * (the composable transform(sequence)/concat_ws/element_at formulation
  * pays ~40µs/shingle in the higher-order-function interpreter — this
  * is the same semantics at array-copy speed). First-occurrence order,
  * like array_distinct(transform(...)).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"WordShingles n must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string> input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashKernels.wordShingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct xxhash64 values of the n-word shingles of a token
  * array — the ready-to-merge-scan form for Jaccard. One native pass;
  * never materializes shingle strings as a column.
  */
case class HashedShingleSet(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"HashedShingleSet n must be positive, got $n")

  override def dataType: DataType = ArrayType(LongType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingle_set requires array<string> input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashKernels.hashedShingleSet(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.hashedShingleSet($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
