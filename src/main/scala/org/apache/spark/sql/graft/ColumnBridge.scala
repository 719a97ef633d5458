package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions.
  *
  * Spark 4 moved the catalyst-`Expression`-backed `Column` constructor
  * behind `org.apache.spark.sql.classic.ExpressionUtils` (private[sql]).
  * Libraries that define native Catalyst expressions conventionally expose
  * them through a small shim in the `org.apache.spark.sql` namespace —
  * the same technique Spark connector/extension projects use. This is the
  * only file outside the `graft` package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
