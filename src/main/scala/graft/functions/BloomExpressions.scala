package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter, shipped to
  * executors as its serialized bytes inside the expression tree.
  *
  * Why: join pruning. When a huge fact side joins a small-ish key set
  * (benchmark shingles, a blocklist, an id keep-list) the win at 100 TB
  * is dropping non-matching rows BEFORE the shuffle: a KB–MB Bloom
  * filter rides along with the scan stage and eliminates ~(1-fpp) of
  * non-matching rows for free; the exact join afterwards only sees
  * candidates, so false positives cannot reach the output. This is the
  * manual form of Spark's own runtime row-level filtering
  * (InjectRuntimeFilter), usable where the optimizer's version doesn't
  * reach — e.g. probe keys that are derived columns (exploded
  * shingles), not scan columns.
  *
  * Hash symmetry: the build side must insert UTF-8 bytes
  * (`putString`/`putBinary` — `DataFrameStatFunctions.bloomFilter` on a
  * string column does); the probe hashes `UTF8String.getBytes`, the
  * identical byte sequence.
  */
case class BloomMightContainString(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a string input, got $t")
  }

  // Array[Byte] equality is reference-based, so the generated case-class
  // equals would treat two probes of the SAME filter as distinct —
  // canonicalization/subexpression elimination could then never dedupe
  // them and each copy would embed the full filter bytes in the plan
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContainString =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  // Catalyst hashes expressions repeatedly during plan transforms and
  // TreeNode never caches hashCode — recomputing over the full KB–MB
  // filter bytes would add O(filterSize) work per lookup
  @transient private lazy val bytesHash: Int = java.util.Arrays.hashCode(bloomBytes)
  override def hashCode(): Int = 31 * child.hashCode() + bytesHash

  // one deserialization per executor thread, shared across rows
  @transient private lazy val bloom: BloomFilter = BloomFilter.readFrom(bloomBytes)

  /** Row-level probe, called from both interpreted and generated code. */
  def test(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override def nullSafeEval(v: Any): Any = test(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // reference THIS expression object (it carries the lazy filter);
      // the probe stays a virtual call inside the WSCG loop
      val ref = ctx.addReferenceObj("bloomExpr", this,
        classOf[BloomMightContainString].getName)
      s"${ev.value} = $ref.test($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {

  /** Serialize a driver-built [[BloomFilter]] into a probe Column. */
  def bloom_might_contain(c: Column, bf: BloomFilter): Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    GraftBridge.column(
      BloomMightContainString(GraftBridge.expression(c.cast("string")), bos.toByteArray))
  }
}
