package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the sql-private Column↔Expression converters (Spark 4
  * wraps Columns around ColumnNodes; custom Expressions need this hop
  * to surface as Columns). Lives under org.apache.spark.sql.* for
  * `private[sql]` access — the standard extension-library pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
