package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.etl.expressions.PyLiteralToJson
import graft.functions.TopKDouble

/** Session extension registering the engine's native surface:
  *
  *   - SQL functions backed by custom Catalyst expressions:
  *     `py_to_json(col)`, `top_k(col, k)`
  *   - the planner strategy for the custom broadcast range-join operator
  *     ([[graft.plans.RangeJoinPlan]] → [[graft.plans.BroadcastRangeJoinExec]])
  *
  * Activate with either:
  *   SparkSession.builder().withExtensions(new GraftExtensions) — or —
  *   --conf spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _)   => v
    case Literal(v: Long, _)  => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: second argument must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)

    ext.injectFunction((
      new FunctionIdentifier("py_to_json"),
      new ExpressionInfo(classOf[PyLiteralToJson].getName, "py_to_json"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "py_to_json(col) takes exactly one argument")
        PyLiteralToJson(args.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKDouble].getName, "top_k"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "top_k(col, k) takes exactly two arguments")
        TopKDouble(args.head, intArg(args(1), "top_k")).toAggregateExpression()
      }))
  }
}
