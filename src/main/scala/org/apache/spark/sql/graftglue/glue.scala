package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column<->Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils). Lives under
  * the org.apache.spark.sql package solely to satisfy the access scope —
  * the standard pattern for libraries providing native Catalyst
  * expressions. No Spark behavior is modified.
  */
object glue {
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}
