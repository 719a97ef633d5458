package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** `array_pairs(xs)` — generator emitting every i<j combination of an
  * array as rows `(a, b)`, preserving element order (for a sorted
  * posting list, `a < b` by construction).
  *
  * This is the pair-emission step of inverted-index near-dup joins
  * (one row per shingle → one row per candidate pair). The composed form
  * — nested `transform`/`slice` building an array-of-structs, `flatten`,
  * then `explode` — allocates every pair TWICE (once into the nested
  * array through interpreted lambda calls, once exploding it) and holds
  * the whole O(n²) pair array per posting list in memory. The generator
  * streams pairs one at a time through `GenerateExec`: no intermediate
  * array, no lambda dispatch, memory O(1) per list. (Generator eval is a
  * codegen boundary either way — `explode` of a computed array is too.)
  */
case class ArrayPairs(child: Expression) extends UnaryExpression
  with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_pairs expects an array, got ${other.catalogString}")
  }

  private def elemType = child.dataType.asInstanceOf[ArrayType]

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", elemType.elementType, elemType.containsNull),
    StructField("b", elemType.elementType, elemType.containsNull)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) Iterator.empty
    else {
      val xs = arr.asInstanceOf[ArrayData]
      val et = elemType.elementType
      val n = xs.numElements()
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        def hasNext: Boolean = n >= 2 && i < n - 1
        def next(): InternalRow = {
          val row = new GenericInternalRow(
            Array[Any](xs.get(i, et), xs.get(j, et)))
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayPairs =
    copy(child = newChild)
}

object ArrayPairs {
  /** Column API: `select(array_pairs($"docs").as(Seq("doc_a", "doc_b")))`. */
  def array_pairs(c: Column): Column =
    ColumnBridge.column(ArrayPairs(ColumnBridge.expression(c)))
}
