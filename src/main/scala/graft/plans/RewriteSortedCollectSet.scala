package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, SortArray}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectSet, Complete}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: collapse `sort_array(collect_set(x))` (BIGINT x, ascending
  * sort, Complete/Partial mode, no DISTINCT/FILTER) into the one-pass
  * [[SortedDistinctSetAgg]]. Keeps the exact result type (array<bigint>) and
  * semantics — `collect_set` drops nulls and dedups; so does the replacement.
  */
object RewriteSortedCollectSet extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      agg.transformExpressions {
        case SortArray(
              ae @ AggregateExpression(cs: CollectSet, _, false, None, _),
              Literal(true, _)) if cs.child.dataType == LongType =>
          ae.copy(aggregateFunction =
            SortedDistinctSetAgg(cs.child, cs.mutableAggBufferOffset, cs.inputAggBufferOffset))
      }
  }
}
