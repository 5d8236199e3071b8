package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 hides the converters behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`);
  * custom native expressions (graft.functions.DotProduct) need them
  * to surface as `Column`s. One-liner forwarders, nothing else.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on an existing session (the
    * `spark.sql.extensions` path only applies at session build).
    */
  def registerFunction(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
