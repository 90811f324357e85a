package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column <-> Expression converters —
  * the supported way for libraries to attach custom Catalyst
  * expressions to the public Column API in Spark 4.x. Lives in an
  * org.apache.spark.sql subpackage solely for access; contains no
  * logic. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
