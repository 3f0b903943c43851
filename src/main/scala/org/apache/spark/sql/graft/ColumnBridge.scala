package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ⇄ Expression converters so the
  * engine's custom Catalyst expressions can be exposed as `Column`s from
  * outside the `org.apache.spark.sql` package (Spark 4 removed the public
  * `Column.expr` / `new Column(expr)` surface). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
