package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column constructor so graft's native
  * Catalyst expressions (e.g. [[graft.functions.DotProduct]]) can be used
  * as ordinary `Column`s from the public DataFrame API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Registers graft's native expressions in the session's function
    * registry so the SQL surface can call them (`graft_dot(a, b)`).
    */
  def registerFunctions(spark: SparkSession): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(
        "graft_dot",
        exprs => {
          require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
          graft.functions.DotProduct(exprs(0), exprs(1))
        },
        "built-in")
}
