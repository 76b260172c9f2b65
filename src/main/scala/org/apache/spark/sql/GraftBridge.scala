package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion — the standard
  * technique for Spark extension libraries that define native Catalyst
  * expressions with a Column API (Spark 4 moved Column to ColumnNode; the
  * conversion helpers live in org.apache.spark.sql.classic.ExpressionUtils).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
