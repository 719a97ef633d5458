package graft.etl.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression converting a Python-literal string cell to
  * JSON (see [[graft.etl.PyLiteralParser]]). A custom Expression rather
  * than a Scala UDF so it participates in whole-stage codegen — the
  * generated code calls the static parser directly, with no encoder
  * round-trip or closure serialization per row. Returns null on malformed
  * input (null-intolerant on null input).
  */
case class PyLiteralToJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val out = graft.etl.PyLiteralParser.toJson(input.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("pyJson")
      s"""
         |String $r = graft.etl.PyLiteralParser.toJson($c.toString());
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PyLiteralToJson =
    copy(child = newChild)
}

object PyLiteralToJson {
  /** Column-level API: `py_to_json($"array_trackingEvents")`. */
  def pyToJson(c: Column): Column =
    ColumnBridge.column(PyLiteralToJson(ColumnBridge.expression(c)))
}
