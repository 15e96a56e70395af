package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 made `Column.expr` / `new Column(expr)` private[sql]
  * (columns wrap `ColumnNode`s now); external libraries that define native
  * Catalyst expressions use an in-package shim to convert. This is the only
  * file that reaches into Spark internals.
  */
object Shims {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
