package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token n-gram array in one primitive per-row loop:
  * `token_shingles(text, n, distinct)` — split on a single literal
  * space, join each n-token window with spaces, optionally keep only
  * first occurrences.
  *
  * Semantics are IDENTICAL to the higher-order-function form in
  * [[Text.shingles]] (`array_distinct(transform(sequence(...),
  * i → concat_ws(" ", slice(toks, i, n))))`): Java `String.split(" ", -1)`
  * matches Spark's `split(c, " ")` including empty tokens from doubled /
  * leading / trailing spaces, window joins preserve those empties, and
  * LinkedHashSet reproduces array_distinct's first-occurrence order.
  * Fewer than n tokens → empty array (never null for null-safety at the
  * caller, see [[Text.shingles]]).
  *
  * Why native: `transform`/`slice`/`concat_ws` lambdas are interpreted
  * per ELEMENT (CodegenFallback — the round-2 lesson), and shingling is
  * the per-token hot loop under the entire near-dup family (exact
  * Jaccard, MinHash, coverage, contamination) — at corpus scale that
  * interpreter is the operator. This expression runs one static-helper
  * loop inside whole-stage codegen, like [[RollingHashLong]].
  */
case class TokenShingles(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_shingles expects (string, n >= 1), got " +
        s"(${child.dataType.catalogString}, $n)")

  override def nullSafeEval(input: Any): Any =
    TokenShingles.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenShingles.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

object TokenShingles {

  /** Static so generated code calls it directly (no closure capture). */
  def compute(s: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val nGrams = toks.length - n + 1
    val sb = new java.lang.StringBuilder
    if (distinct) {
      // LinkedHashSet == array_distinct: keep first occurrence, in order
      val seen = new java.util.LinkedHashSet[String](nGrams * 2)
      var i = 0
      while (i < nGrams) {
        seen.add(gram(sb, toks, i, n))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](nGrams)
      var i = 0
      while (i < nGrams) {
        out(i) = UTF8String.fromString(gram(sb, toks, i, n))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  private def gram(sb: java.lang.StringBuilder, toks: Array[String],
      start: Int, n: Int): String = {
    sb.setLength(0)
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(toks(start + j))
      j += 1
    }
    sb.toString
  }

  /** Column API: distinct shingle set (the near-dup comparison unit). */
  def token_shingles(c: Column, n: Int): Column =
    ColumnBridge.column(TokenShingles(ColumnBridge.expression(c), n,
      distinct = true))

  /** Column API: non-distinct n-gram occurrences (repetition stats). */
  def token_ngrams(c: Column, n: Int): Column =
    ColumnBridge.column(TokenShingles(ColumnBridge.expression(c), n,
      distinct = false))
}
