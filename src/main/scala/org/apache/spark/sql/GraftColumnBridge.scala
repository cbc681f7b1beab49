package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's private[sql] Column ⇄ Expression converters
  * (Column wraps a ColumnNode since 4.0; custom Catalyst expressions
  * need these to surface as user-facing Columns). The in-package bridge
  * is the same approach public Spark extension libraries use.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
