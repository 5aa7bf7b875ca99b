package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.{CleanToken, RewriteSortedCollectSet, SortedDistinctSetAgg}

/** Engine extensions, installable on any session:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  *  - SQL function `sorted_set_agg(bigint) -> array<bigint>`: one-pass sorted
  *    distinct set (see [[graft.plans.SortedDistinctSetAgg]])
  *  - optimizer rule rewriting `sort_array(collect_set(x))` to it
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("sorted_set_agg"),
      new ExpressionInfo(classOf[SortedDistinctSetAgg].getName, "sorted_set_agg"),
      (exprs: Seq[Expression]) => SortedDistinctSetAgg(exprs.head).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("graft_clean_token"),
      new ExpressionInfo(classOf[CleanToken].getName, "graft_clean_token"),
      (exprs: Seq[Expression]) => CleanToken(exprs.head)))
    e.injectOptimizerRule(_ => RewriteSortedCollectSet)
  }
}
