package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's code points:
  * `fp = fold(0, acc·31 + codePoint) mod 1e9+7`; empty string → 0.
  *
  * Semantics are IDENTICAL to the higher-order-function form
  * (`aggregate(transform(sequence(1, length(c)), i → ascii(substr(i,1))),
  * …)`) — `length`/`substr`/`ascii` all operate on code points — and to
  * the DuckDB oracle's `list_reduce` form, so t04 stays value-exact. The
  * HOF form materializes a code-point array and folds it with boxed
  * lambda calls per document; fingerprinting is a per-character loop over
  * the whole corpus, so at scale that interpreter IS the operator. This
  * expression runs one primitive loop via a static helper inside
  * whole-stage codegen.
  */
case class RollingHashLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingHashLong.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashLong.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): RollingHashLong =
    copy(child = newChild)
}

object RollingHashLong {
  final val Mod = 1000000007L

  /** Static so generated code calls it directly (no closure capture). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column API: `rolling_hash($"text")` → bigint fingerprint. */
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHashLong(ColumnBridge.expression(c)))
}
