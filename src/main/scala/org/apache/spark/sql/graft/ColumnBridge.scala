package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters (Spark 4
  * moved Column onto column nodes; `ExpressionUtils` is the supported
  * classic-session conversion but is sql-private). Used by graft's native
  * expressions that attach directly to a Column without a function-registry
  * round trip — same mechanism `call_function` resolves to, minus the
  * registration-order dependency. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
