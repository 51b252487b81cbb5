package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * supported way for a library to wrap custom Catalyst expressions in
  * Spark 4's ColumnNode world without registering SQL functions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to the `private[sql]` function registry, for registering
  * graft's native expressions on a live session (the
  * SparkSessionExtensions path only applies at session construction).
  */
object FunctionBridge {
  def register(spark: org.apache.spark.sql.SparkSession, name: String,
               info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
               builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
