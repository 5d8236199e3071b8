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
}
