package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Expression ⇄ Column converters —
  * the supported way in Spark 4 to expose a custom Catalyst
  * `Expression` through the public Column API (Column no longer wraps
  * an Expression directly; it wraps a ColumnNode).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
