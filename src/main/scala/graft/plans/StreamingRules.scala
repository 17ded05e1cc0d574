package graft.plans

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.functions.ExactCountDistinctLong

/** Analyzer rule making exact `countDistinct` legal on streams.
  *
  * Structured Streaming rejects distinct aggregates outright (the
  * reference's daily query dies on exactly this — SURVEY B3). The
  * rewrite swaps `Count(x) [distinct]` on a streaming Aggregate for the
  * engine's [[ExactCountDistinctLong]] typed-imperative aggregate —
  * same exact semantics, but expressed as a regular (non-distinct)
  * aggregate whose hash-set buffer merges map-side, which the streaming
  * state store handles like any other agg state.
  *
  * Runs as a resolution rule (injected via [[GraftExtensions]]) so the
  * plan is already rewritten when UnsupportedOperationChecker inspects
  * it at query start.
  */
object RewriteStreamingExactDistinct extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate if agg.resolved && agg.child.isStreaming =>
      agg.transformExpressions {
        case AggregateExpression(c: Count, mode, true, filter, id)
            if c.children.size == 1 &&
              Seq(ByteType, ShortType, IntegerType, LongType).contains(c.children.head.dataType) =>
          AggregateExpression(
            ExactCountDistinctLong(Cast(c.children.head, LongType)),
            mode, isDistinct = false, filter, id)
      }
  }
}
