package graft.functions

import java.io.{DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native top-k aggregate: `top_k(col, k)` keeps the k largest values of a
  * double column per group, returned as a descending-sorted array.
  *
  * A [[BoundedHeapAggregate]] — the canonical mergeable top-k sketch.
  * Memory is O(k) per group regardless of group size, and partial
  * aggregation applies: each map task reduces its partition to k values
  * BEFORE the shuffle, so the exchange moves k·groups values instead of
  * all rows. Contrast with the window-function formulation
  * (`row_number() ≤ k`), which must shuffle every row of every group — at
  * 100 TB the heap aggregate is the difference between shipping k rows
  * and shipping the table.
  */
case class TopKDouble(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends BoundedHeapAggregate[Double] with UnaryLike[Expression] {

  require(k > 0, "top_k requires k > 0")

  // worse = smaller value (largest values are kept)
  override protected val worstFirst: Ordering[Double] =
    (a: Double, b: Double) => java.lang.Double.compare(b, a)

  override protected def writeElem(out: DataOutputStream, e: Double): Unit =
    out.writeDouble(e)
  override protected def readElem(in: DataInputStream): Double =
    in.readDouble()

  override def update(buf: mutable.PriorityQueue[Double],
      input: InternalRow): mutable.PriorityQueue[Double] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Double])
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Double]): Any =
    new GenericArrayData(bestFirst(buf))

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDouble =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDouble =
    copy(inputAggBufferOffset = newOffset)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override protected def withNewChildInternal(newChild: Expression): TopKDouble =
    copy(child = newChild)
}

object TopKDouble {
  /** Column API: `top_k($"x", 10)` → array<double> of the 10 largest.
    * Input is cast to double (matching [[TopKPairs.top_k_pairs]] and the
    * SQL registration): the update path assumes Double and would
    * ClassCastException on int/decimal columns otherwise. */
  def top_k(c: Column, k: Int): Column =
    ColumnBridge.column(
      TopKDouble(ColumnBridge.expression(c.cast("double")), k)
        .toAggregateExpression())
}
