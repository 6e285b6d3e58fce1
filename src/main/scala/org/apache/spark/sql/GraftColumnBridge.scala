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
    * registry so the SQL surface can call them (`graft_dot(a, b)`,
    * `graft_token_hashes(arr)`, `graft_shingle_hashes(arr, n)`,
    * `graft_minhash_bands(arr, numPerm, rows)`, `graft_simhash(arr)`).
    */
  def registerFunctions(spark: SparkSession): Unit = {
    val registry =
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry

    def register(name: String, arity: Int)(
        build: Seq[Expression] => Expression): Unit =
      registry.createOrReplaceTempFunction(
        name,
        exprs => {
          require(exprs.length == arity, s"$name takes exactly $arity arguments")
          build(exprs)
        },
        "built-in")

    def intLit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case _ => throw new IllegalArgumentException(s"$what must be an int literal")
    }

    register("graft_dot", 2)(e => graft.functions.DotProduct(e(0), e(1)))
    register("graft_token_hashes", 1)(e => graft.functions.TokenHashes(e(0)))
    register("graft_shingle_hashes", 2)(e =>
      graft.functions.ShingleHashes(e(0), intLit(e(1), "shingle width")))
    register("graft_minhash_bands", 3)(e =>
      graft.functions.MinHashBandHashes(
        e(0), intLit(e(1), "numPerm"), intLit(e(2), "rows")))
    register("graft_simhash", 1)(e => graft.functions.SimHashSig(e(0)))
  }
}
