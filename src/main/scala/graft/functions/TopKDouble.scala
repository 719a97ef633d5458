package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native top-k aggregate: `top_k(col, k)` keeps the k largest values of a
  * double column per group, returned as a descending-sorted array.
  *
  * A `TypedImperativeAggregate` with a bounded min-heap buffer — the
  * canonical mergeable top-k sketch. Memory is O(k) per group regardless
  * of group size, and partial aggregation applies: each map task reduces
  * its partition to k values BEFORE the shuffle, so the exchange moves
  * k·groups values instead of all rows. Contrast with the window-function
  * formulation (`row_number() ≤ k`), which must shuffle every row of
  * every group — at 100 TB the heap aggregate is the difference between
  * shipping k rows and shipping the table.
  */
case class TopKDouble(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Double]]
  with UnaryLike[Expression] {

  require(k > 0, "top_k requires k > 0")

  // min-heap: head is the SMALLEST of the kept values → O(log k) evict
  override def createAggregationBuffer(): mutable.PriorityQueue[Double] =
    mutable.PriorityQueue.empty[Double](Ordering[Double].reverse)

  override def update(buf: mutable.PriorityQueue[Double],
      input: InternalRow): mutable.PriorityQueue[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (buf.size < k) buf.enqueue(d)
      else if (d > buf.head) { buf.dequeue(); buf.enqueue(d) }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[Double],
      other: mutable.PriorityQueue[Double]): mutable.PriorityQueue[Double] = {
    other.foreach { d =>
      if (buf.size < k) buf.enqueue(d)
      else if (d > buf.head) { buf.dequeue(); buf.enqueue(d) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Double]): Any =
    new GenericArrayData(buf.toArray.sorted(Ordering[Double].reverse))

  override def serialize(buf: mutable.PriorityQueue[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue(in.readDouble()); i += 1 }
    buf
  }

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
  /** Column API: `top_k($"x", 10)` → array<double> of the 10 largest. */
  def top_k(c: Column, k: Int): Column =
    ColumnBridge.column(
      TopKDouble(ColumnBridge.expression(c), k).toAggregateExpression())
}
