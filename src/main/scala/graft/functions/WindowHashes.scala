package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `window_hashes(text, w, stride)` — generator emitting
  * `(pos, h)` for every `stride`-spaced window of `w` CODE POINTS:
  * `h = fold(0, acc·31 + codePoint) mod 1e9+7` over the window
  * (the [[RollingHashLong]] recurrence, so the DuckDB oracle can
  * reproduce it with `ascii(substring(...))` + `list_reduce` exactly).
  * `pos` is the 0-based code-point offset — both Spark's `substring`
  * and DuckDB's count code points, so `substring(text, pos + 1, w)`
  * retrieves the window identically on either engine.
  *
  * The rolling update is O(1) per position (subtract the outgoing
  * code point's `31^(w-1)` term, multiply, add the incoming one), so
  * a document costs O(len) regardless of `w` — the per-window
  * recompute (O(len·w), what a `transform`/`substring` HOF chain
  * would do interpreted) is what makes exact substring dedup
  * infeasible without this operator. Documents shorter than `w`
  * emit nothing.
  */
case class RollingWindowHashes(child: Expression, w: Int, stride: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType &&
        w >= 1 && stride >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"window_hashes expects (string, w >= 1, stride >= 1), got " +
        s"(${child.dataType.catalogString}, $w, $stride)")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val cps = v.asInstanceOf[UTF8String].toString.codePoints().toArray
      val n = cps.length
      if (n < w) Iterator.empty
      else {
        val M = RollingHashLong.Mod
        // 31^(w-1) mod M — the outgoing code point's coefficient
        var pw = 1L
        var i = 0
        while (i < w - 1) { pw = pw * 31 % M; i += 1 }
        // initial window fold
        var h = 0L
        i = 0
        while (i < w) { h = (h * 31 + cps(i)) % M; i += 1 }
        new Iterator[InternalRow] {
          private var pos = 0
          private var cur = h
          private var primed = true // window at `pos` already folded
          def hasNext: Boolean = pos + w <= n
          def next(): InternalRow = {
            if (!primed) {
              // roll forward from pos-stride to pos (stride O(1) steps)
              var j = pos - stride
              while (j < pos) {
                val out = cps(j) * pw % M
                cur = ((cur - out + M) % M * 31 + cps(j + w)) % M
                j += 1
              }
              primed = true
            }
            val row = new GenericInternalRow(Array[Any](pos, cur))
            pos += stride
            primed = false
            row
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): RollingWindowHashes =
    copy(child = newChild)
}

object RollingWindowHashes {
  /** Column API: `window_hashes($"text", 50, 1).as(Seq("pos", "h"))`. */
  def window_hashes(c: Column, w: Int, stride: Int = 1): Column =
    ColumnBridge.column(RollingWindowHashes(ColumnBridge.expression(c), w, stride))
}
