package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.GraftBridge

/** Whole-operator custom plan: top-k rows per group.
  *
  * The built-in formulation — `row_number().over(partitionBy(g).orderBy(o))
  * <= k` — shuffles EVERY input row to the group's reducer and sorts
  * whole partitions. This operator plans like a partial aggregation
  * instead:
  *
  *   TopKPerGroupExec(partial=true)   — bounded heap per group per input
  *                                      partition; emits ≤ k rows/group
  *   → Exchange(hash by group)        — inserted by Spark because the
  *                                      final node requires clustering
  *   → TopKPerGroupExec(partial=false)— merge heaps, emit final top-k
  *
  * At 100 TB the exchange carries k·|groups| rows instead of the whole
  * fact table — the same reduction partial aggregation gives sums.
  *
  * Demonstrates the full custom-operator stack (SURVEY §7.3's option c):
  * LogicalPlan node + Strategy + SparkPlan pair + SparkSessionExtensions
  * injection.
  */
case class TopKPerGroup(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"TopKPerGroup k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(grouping, order, k, child) =>
      TopKPerGroupExec(grouping, order, k, partial = false,
        TopKPerGroupExec(grouping, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(grouping))

  /** Partial-stage group cap: beyond this many groups in one partition
    * the operator stops filtering and passes rows through (correct —
    * the final stage still selects the true top-k; only the shuffle
    * reduction is lost). Spark's partial aggregates make the same
    * memory-vs-reduction tradeoff by spilling; pass-through is the
    * spill-free equivalent for a bounded-k operator.
    */
  private val maxPartialGroups = 1 << 20

  override protected def doExecute(): RDD[InternalRow] = {
    val groupingLocal = grouping
    val orderLocal = order
    val kLocal = k
    val partialLocal = partial
    val maxGroups = maxPartialGroups
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupingLocal, childOutput)
      val ordering = GenerateOrdering.generate(orderLocal, childOutput)
      // PriorityQueue.head is the LARGEST by its Ordering; by the sort
      // ordering, "largest" compare value = sorts LAST = worst of the
      // kept k — exactly what eviction needs. (reverse() here would make
      // head the BEST and evict it — keeping bottom-k.)
      val heapOrd: Ordering[InternalRow] = (a: InternalRow, b: InternalRow) => ordering.compare(a, b)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      // overflow rows stream straight through (no buffering): the heap
      // drain on the right of ++ is by-name, built only after the input
      // is exhausted
      iter.flatMap { row =>
        val key = groupProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kLocal) {
              heap += row.asInstanceOf[UnsafeRow].copy()
            } else if (ordering.compare(row, heap.head) < 0) {
              heap.dequeue()
              heap += row.asInstanceOf[UnsafeRow].copy()
            }
            None
          case None if partialLocal && heaps.size >= maxGroups =>
            // group-cardinality guard: stop growing state, forward the
            // row — the final stage finishes the job
            Some(row)
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](heapOrd.on[UnsafeRow](identity))
            h += row.asInstanceOf[UnsafeRow].copy()
            heaps.put(key.copy(), h)
            None
        }
      } ++ heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** SparkSessionExtensions entry point — inject via
  * `.withExtensions(new GraftExtensions)` (GraftSession does) or the
  * `spark.sql.extensions` config.
  *
  * Besides the physical strategy and the analyzer rule, this registers
  * the engine's custom expressions/aggregates as SQL functions, so a
  * pure-`spark.sql` user (the reference's API style) reaches them
  * without touching the Column API. Sketch parameters must be literals
  * — they configure the aggregation buffer, which exists before any
  * row is seen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litDouble(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Int, _) => v.toDouble
    // un-suffixed SQL literals like 1.02 parse as DecimalType
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def register(
      ext: SparkSessionExtensions, name: String, clazz: Class[_],
      usage: String, arity: Int, variadicMin: Boolean = false)(
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      // full 11-arg form (the shorter ones are deprecated): DESCRIBE
      // FUNCTION shows the real implementing class where it belongs AND
      // the usage text in its own field
      new ExpressionInfo(clazz.getCanonicalName, null, name, usage,
        "", "", "", "", "", "", "built-in"),
      args => {
        // explicit arity check BEFORE the builder runs — a MatchError
        // catch around it would also mask a genuine MatchError thrown
        // from inside an expression constructor
        val ok = if (variadicMin) args.size >= arity else args.size == arity
        if (!ok) throw new IllegalArgumentException(
          s"$name: expected ${if (variadicMin) s"at least $arity" else s"$arity"} " +
            s"argument(s), got ${args.size} — $usage")
        builder(args)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    // analyzer rewrite: exact countDistinct becomes legal on streams
    ext.injectResolutionRule(_ => RewriteStreamingExactDistinct)

    register(ext, "graft_vec_dot", classOf[graft.functions.FloatVecDot],
      "float-vector dot product (double accumulation)", 2) {
      case Seq(a, b) => graft.functions.FloatVecDot(a, b)
    }
    register(ext, "graft_int_vec_dot", classOf[graft.functions.IntVecDot],
      "integer-vector dot product (long accumulation, exact)", 2) {
      case Seq(a, b) => graft.functions.IntVecDot(a, b)
    }
    register(ext, "graft_word_shingles", classOf[graft.functions.WordShingles],
      "distinct n-word shingles of a token array", 2) {
      case Seq(t, n) => graft.functions.WordShingles(t, litInt(n, "shingle width"))
    }
    register(ext, "graft_hashed_shingle_set", classOf[graft.functions.HashedShingleSet],
      "sorted distinct 64-bit hashes of n-word shingles", 2) {
      case Seq(t, n) => graft.functions.HashedShingleSet(t, litInt(n, "shingle width"))
    }
    register(ext, "graft_morton_code", classOf[graft.functions.MortonCode],
      "Z-order bit interleave of two non-negative bigints", 2) {
      case Seq(x, y) => graft.functions.MortonCode(
        Cast(x, org.apache.spark.sql.types.LongType),
        Cast(y, org.apache.spark.sql.types.LongType))
    }
    register(ext, "graft_sorted_intersect_count", classOf[graft.functions.SortedLongIntersectCount],
      "intersection size of two sorted long arrays", 2) {
      case Seq(a, b) => graft.functions.SortedLongIntersectCount(a, b)
    }
    register(ext, "graft_minhash_signature", classOf[graft.functions.MinHashSignature],
      "k-seed MinHash signature of a token array", 2) {
      case Seq(t, k) => graft.functions.MinHashSignature(t, litInt(k, "signature size"))
    }
    register(ext, "graft_simhash", classOf[graft.functions.SimHashMd5],
      "md5-derived SimHash of a token array at the given bit width", 2) {
      case Seq(t, bits) => graft.functions.SimHashMd5(t, litInt(bits, "bits"))
    }
    register(ext, "graft_top_ngram_frac", classOf[graft.functions.TopNgramFrac],
      "fraction of a doc's tokens covered by its most repeated n-gram", 2) {
      case Seq(t, n) => graft.functions.TopNgramFrac(t, litInt(n, "ngram width"))
    }
    // input casts mirror the Column-API wrappers in AggregateFunctions:
    // each buffer update unboxes one concrete type
    register(ext, "graft_exact_count_distinct", classOf[graft.functions.ExactCountDistinctLong],
      "exact distinct count, streaming-legal", 1) {
      case Seq(c) => graft.functions.ExactCountDistinctLong(
        Cast(c, org.apache.spark.sql.types.LongType))
    }
    register(ext, "graft_bounded_collect_set", classOf[graft.functions.BoundedCollectSet],
      "collect_set keeping the cap smallest distinct strings", 2) {
      case Seq(c, cap) => graft.functions.BoundedCollectSet(
        Cast(c, org.apache.spark.sql.types.StringType), litInt(cap, "cap"))
    }
    register(ext, "graft_misra_gries", classOf[graft.functions.MisraGriesSketch],
      "Misra-Gries frequent-item candidates with k counters", 2) {
      case Seq(c, k) => graft.functions.MisraGriesSketch(
        Cast(c, org.apache.spark.sql.types.StringType), litInt(k, "k"))
    }
    register(ext, "graft_dd_quantiles", classOf[graft.functions.DDSketchQuantiles],
      "DDSketch quantile estimates at the given gamma", 3, variadicMin = true) {
      case c +: gamma +: qs if qs.nonEmpty =>
        graft.functions.DDSketchQuantiles(
          Cast(c, org.apache.spark.sql.types.DoubleType),
          litDouble(gamma, "gamma"), qs.map(litDouble(_, "quantile")))
    }
  }
}

object TopKPerGroup {
  /** Dataset-level helper: top-k rows per group by the given orderings. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    val plan = TopKPerGroup(
      groupCols.map(GraftBridge.resolvedExpression(df, _)),
      orderCols.map(GraftBridge.resolvedSortOrder(df, _)),
      k,
      GraftBridge.logicalPlan(df))
    GraftBridge.ofRows(df.sparkSession, plan)
  }
}
