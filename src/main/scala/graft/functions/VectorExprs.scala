package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector arithmetic over `array<double>` columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is CodegenFallback:
  * every pair evaluation allocates a zipped array and walks it with boxed
  * lambda calls. For pairwise workloads (KNN candidate scoring, exact
  * embedding dedup, k-means assignment) that interpreted loop IS the
  * runtime. These expressions generate a primitive fused loop inside
  * whole-stage codegen instead — same arithmetic, no allocation.
  *
  * Determinism contract: accumulation is STRICTLY left-to-right, index 0
  * upward — bit-for-bit the same doubles as the higher-order-function
  * form and as DuckDB's `list_dot_product`, so existing value-exact
  * oracles are unaffected. Null ARRAYS propagate null; null ELEMENTS are
  * not supported (callers pass dense embedding vectors). Length-mismatched
  * arrays return NULL — matching the zip_with form, where the padded null
  * lanes poison the sum; a truncated (corrupt) vector must surface as a
  * conspicuous null similarity, never as a plausible partial dot product.
  */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<double>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  /** Scala accumulation step (interpreted path). */
  protected def step(acc: Double, x: Double, y: Double): Double
  /** Java accumulation statement template (codegen path). */
  protected def stepCode(acc: String, x: String, y: String): String

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) { acc = step(acc, xs.getDouble(i), ys.getDouble(i)); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${stepCode(acc, s"$a.getDouble($i)", s"$b.getDouble($i)")}
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** `dot_double(a, b)` = Σ a(i)·b(i), left-to-right. */
case class DotProductDouble(left: Expression, right: Expression)
  extends VectorFoldExpression {
  override protected def step(acc: Double, x: Double, y: Double): Double =
    acc + x * y
  override protected def stepCode(acc: String, x: String, y: String): String =
    s"$acc = $acc + $x * $y;"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)
}

/** `sq_dist_double(a, b)` = Σ (a(i)-b(i))², left-to-right. */
case class SqDistDouble(left: Expression, right: Expression)
  extends VectorFoldExpression {
  override protected def step(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  override protected def stepCode(acc: String, x: String, y: String): String =
    s"double __d = $x - $y; $acc = $acc + __d * __d;"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistDouble =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  def dot_double(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductDouble(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sq_dist_double(a: Column, b: Column): Column =
    ColumnBridge.column(SqDistDouble(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
