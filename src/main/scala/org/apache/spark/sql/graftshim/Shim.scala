package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column<->Expression converters (the Spark
  * 4 Connect refactor removed the public `new Column(expr)` path).
  * Lives under org.apache.spark.sql so the private[sql] members
  * resolve; keep this file free of any logic.
  */
object Shim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
