package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a trained BPE merge table to one pre-token: start from the
  * word's code points and apply every merge in rank order as a leftmost,
  * non-overlapping replacement — EXACTLY the fold
  * [[graft.operators.Bpe]] uses while training, so encoding a corpus
  * with its own merge table reproduces the training segmentation.
  *
  * The merge table is an expression constructor field (driver-side
  * value, shipped once inside the serialized plan and referenced from
  * generated code via `addReferenceObj`), NOT a per-row column: vocab
  * merges are plan constants, and threading them as data would rebuild
  * the table row by row. The per-row work is one primitive loop —
  * O(merges × word length) — inside whole-stage codegen.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_encode expects string, got ${child.dataType.catalogString}")

  @transient private lazy val mergeArr: Array[(String, String)] =
    merges.toArray

  /** Instance (not static) so generated code reaches the merge table
    * through the plan reference — no re-parse, no broadcast needed. */
  def encode(w: UTF8String): ArrayData = {
    val str = w.toString
    // code-point symbols (matches Bpe.trainBpe's substr(i, 1) split and
    // DuckDB's code-point string semantics — never UTF-16 chars)
    var syms = new Array[String](str.codePointCount(0, str.length))
    var i = 0
    var n = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val cw = Character.charCount(cp)
      syms(n) = str.substring(i, i + cw)
      n += 1
      i += cw
    }
    var mi = 0
    while (mi < mergeArr.length && n >= 2) {
      val l = mergeArr(mi)._1
      val r = mergeArr(mi)._2
      var read = 0
      var write = 0
      while (read < n) {
        if (read + 1 < n && syms(read) == l && syms(read + 1) == r) {
          syms(write) = l + r
          read += 2
        } else {
          syms(write) = syms(read)
          read += 1
        }
        write += 1
      }
      n = write
      mi += 1
    }
    val out = new Array[AnyRef](n)
    var j = 0
    while (j < n) { out(j) = UTF8String.fromString(syms(j)); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this,
      classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** Column API: `bpe_encode($"piece", merges)` → array&lt;string&gt;. */
  def bpe_encode(c: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(c), merges))
}
