package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column<->Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 made `ExpressionUtils.column/expression` private[sql]; an
  * extension library that defines its own `Expression`s needs exactly these
  * two hooks, so this one-file shim lives in the org.apache.spark.sql
  * package — the standard pattern for Catalyst extension libraries (no Spark
  * internals are re-implemented here).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
