package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom typed-imperative aggregates.
  *
  * Why custom: Structured Streaming rejects exact `countDistinct`
  * (SURVEY B3) and `collect_set` state is unbounded per group (SURVEY
  * §7.4 risk 2). These two aggregates are the engine's answers — an
  * exact distinct that works anywhere, and a collect_set with a hard
  * per-group cap that keeps the deterministic subset (the N smallest
  * elements), so memory is bounded at any scale.
  */

/** Exact distinct count of a long column via an open hash set buffer.
  * Partial aggregation merges sets map-side, so the exchange carries
  * one set per group per partition, not raw rows.
  */
case class ExactCountDistinctLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashSet[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): mutable.HashSet[Long] = mutable.HashSet.empty

  override def update(buf: mutable.HashSet[Long], input: InternalRow): mutable.HashSet[Long] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[Long]
    buf
  }

  override def merge(buf: mutable.HashSet[Long], other: mutable.HashSet[Long]): mutable.HashSet[Long] =
    buf ++= other

  override def eval(buf: mutable.HashSet[Long]): Any = buf.size.toLong

  override def serialize(buf: mutable.HashSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashSet.empty[Long]
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactCountDistinctLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactCountDistinctLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** collect_set with a hard cap: keeps the `cap` SMALLEST distinct
  * strings (deterministic — independent of encounter order), emitted
  * sorted. Buffer is a bounded TreeSet, so per-group state never
  * exceeds `cap` elements on any executor.
  */
case class BoundedCollectSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[String]] {

  require(cap > 0, s"BoundedCollectSet cap must be positive, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType)

  override def createAggregationBuffer(): mutable.TreeSet[String] = mutable.TreeSet.empty

  private def add(buf: mutable.TreeSet[String], s: String): Unit = {
    if (buf.size < cap) buf += s
    else if (s < buf.last) { buf += s; if (buf.size > cap) buf -= buf.last }
  }

  override def update(buf: mutable.TreeSet[String], input: InternalRow): mutable.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString)
    buf
  }

  override def merge(buf: mutable.TreeSet[String], other: mutable.TreeSet[String]): mutable.TreeSet[String] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[String]): Any =
    new GenericArrayData(buf.toSeq.map(s => UTF8String.fromString(s): Any).toArray)

  // length-prefixed raw UTF-8 (writeUTF dies past 64 KB — document
  // strings routinely exceed that)
  override def serialize(buf: mutable.TreeSet[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { s =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[String]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += new String(b, "UTF-8")
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Misra–Gries frequent-items sketch: one streaming pass with at most
  * `k` counters per buffer, mergeable across partitions (Agarwal et
  * al., "Mergeable Summaries", PODS'12). Guarantee: every item with
  * true count > n/(k+1) survives to the output candidate set, and kept
  * counts undercount by at most n/(k+1). The candidates then get ONE
  * exact recount pass restricted to them — so heavy-hitter/top-N
  * queries never shuffle the full vocabulary (the win when the
  * universe is web-scale n-grams, not when it fits a hash map).
  *
  * Emits the sorted candidate item array; exact counts are the
  * caller's recount join.
  */
case class MisraGriesSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"MisraGriesSketch k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Classic MG step: known item → +1; free slot → new counter; full →
    * decrement every counter (the arriving item is absorbed by the
    * decrement). Amortized O(1): each decrement retires k+1 units of
    * incoming count.
    */
  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < k => buf(s) = 1L
        case None => decrement(buf, 1L)
      }
    }
    buf
  }

  /** Subtract `by` from every counter, dropping those that reach 0. */
  private def decrement(buf: mutable.HashMap[String, Long], by: Long): Unit =
    buf.filterInPlace { case (_, c) => c > by }.mapValuesInPlace((_, c) => c - by)

  /** Mergeable-summaries merge: sum counters, then restore the k-bound
    * by subtracting the (k+1)-th largest count from all (exactly the
    * error the decrement steps would have charged had the streams been
    * concatenated).
    */
  override def merge(buf: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) => buf(s) = buf.getOrElse(s, 0L) + c }
    if (buf.size > k) {
      val kth = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      decrement(buf, kth)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(s => UTF8String.fromString(s): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += new String(b, "UTF-8") -> in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** DDSketch-style quantile sketch (Masson, Lee & Rim, "DDSketch: A
  * Fast and Fully-Mergeable Quantile Sketch with Relative-Error
  * Guarantees", VLDB'19): positive values land in log-spaced buckets
  * i = ⌈ln v / ln γ⌉, so every quantile estimate 2γⁱ/(γ+1) is within
  * relative error (γ−1)/(γ+1) of the true value. The buffer is the
  * bucket→count map — bounded by ⌈ln(max/min)/ln γ⌉ buckets (a few
  * hundred at γ=1.02 over any realistic value range), and the merge is
  * plain count addition: COMMUTATIVE and EXACT, so the result is
  * deterministic under any partitioning / merge order — which is what
  * lets the oracle reproduce it bit-for-bit, and what makes it safe as
  * streaming state where percentile_approx's GK buffer is not
  * merge-order-stable.
  *
  * `eval` returns one estimate per requested quantile: the value at
  * 1-based rank ⌈q·n⌉ in bucket order. Non-positive inputs are
  * ignored by construction (log-bucketing needs v > 0; route
  * zero/negative domains through a caller-side offset).
  */
case class DDSketchQuantiles(
    child: Expression,
    gamma: Double,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Int, Long]] {

  require(gamma > 1.0, s"DDSketch gamma must exceed 1, got $gamma")
  require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
    s"quantiles must lie in (0,1], got $qs")

  override def children: Seq[Expression] = Seq(child)
  // null when the sketch saw no positive value — a silent 0.0 would
  // read as a plausible quantile and diverge from the oracle's NULL
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[Int, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Int, Long], input: InternalRow): mutable.HashMap[Int, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (d > 0.0) {
        // RESIDUAL BOUNDARY ASSUMPTION (shared with the DuckDB twins in
        // quantileSketchSql / lengthOutliersSql): neither JVM Math.log
        // nor libm ln is correctly rounded, so a value landing EXACTLY
        // on a bucket boundary (ln v / ln γ integral) could in principle
        // be assigned adjacent buckets by the two engines. The oracle
        // queries feed integer-valued doubles through γ = 1.02 /
        // 1.0204..., whose boundaries (γ^k) are irrational for k ≠ 0, so
        // no fixture value can sit on one; a 1-ulp divergence off a
        // boundary never flips ceil. Callers needing engine-identical
        // bucketing for arbitrary inputs should pre-round inputs (the
        // repo's usual 4-dp move) rather than trust matching ln
        // implementations.
        val bkt = math.ceil(math.log(d) / math.log(gamma)).toInt
        buf(bkt) = buf.getOrElse(bkt, 0L) + 1
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Int, Long], other: mutable.HashMap[Int, Long]): mutable.HashMap[Int, Long] = {
    other.foreach { case (b, c) => buf(b) = buf.getOrElse(b, 0L) + c }
    buf
  }

  override def eval(buf: mutable.HashMap[Int, Long]): Any = {
    if (buf.isEmpty) return null
    val buckets = buf.toArray.sortBy(_._1)
    val n = buckets.map(_._2).sum
    val ests = qs.map { q =>
      val rank = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L
      var i = 0
      var est = 0.0
      var found = false
      while (i < buckets.length && !found) {
        cum += buckets(i)._2
        if (cum >= rank) { est = 2.0 * math.pow(gamma, buckets(i)._1) / (gamma + 1.0); found = true }
        i += 1
      }
      est
    }
    new GenericArrayData(ests.map(d => d: Any).toArray)
  }

  override def serialize(buf: mutable.HashMap[Int, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (b, c) => out.writeInt(b); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Int, Long]
    var i = 0
    while (i < n) { buf += in.readInt() -> in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DDSketchQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDSketchQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object AggregateFunctions {
  /** Input is cast to long up front — the buffer update unboxes Long,
    * so an un-cast IntegerType column would ClassCastException at
    * runtime.
    */
  def exact_count_distinct(c: Column): Column =
    GraftBridge.column(
      ExactCountDistinctLong(GraftBridge.expression(c.cast("long")))
        .toAggregateExpression())

  /** Input cast to string for the same reason. */
  def bounded_collect_set(c: Column, cap: Int): Column =
    GraftBridge.column(
      BoundedCollectSet(GraftBridge.expression(c.cast("string")), cap)
        .toAggregateExpression())

  /** Frequent-item candidate set (sorted array) with ≤ k counters of
    * state per partition; see [[MisraGriesSketch]].
    */
  def misra_gries(c: Column, k: Int): Column =
    GraftBridge.column(
      MisraGriesSketch(GraftBridge.expression(c.cast("string")), k)
        .toAggregateExpression())

  /** Array of DDSketch quantile estimates (one per entry of `qs`) over
    * a positive double column; see [[DDSketchQuantiles]].
    */
  def dd_quantiles(c: Column, gamma: Double, qs: Seq[Double]): Column =
    GraftBridge.column(
      DDSketchQuantiles(GraftBridge.expression(c.cast("double")), gamma, qs)
        .toAggregateExpression())
}
