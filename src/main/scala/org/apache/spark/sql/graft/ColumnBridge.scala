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

/** Bridge for constructing a DataFrame from a custom LogicalPlan (the
  * `Dataset.ofRows` entry point is private[sql] in Spark 4). */
object PlanBridge {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  /** Stable unique id of a session (private[sql] in Spark 4). */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID
}
