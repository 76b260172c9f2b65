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

  /** Register a native function on an existing session's function registry
    * (SparkSessionExtensions only applies while a session is being built).
    */
  def registerFunction(spark: SparkSession, name: String,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
