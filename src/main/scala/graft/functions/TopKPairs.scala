package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native top-k-by-score aggregate over (score, id) pairs:
  * `top_k_pairs(score, id, k)` keeps the k pairs with the largest score
  * (ties broken by SMALLEST id — the same total order as
  * `ORDER BY score DESC, id ASC`) and returns them best-first as
  * `array<struct<score double, id bigint>>`.
  *
  * This is the aggregate formulation of per-group top-k re-ranking. The
  * window formulation (`row_number() OVER (PARTITION BY g ORDER BY score
  * DESC) <= k`) must shuffle EVERY candidate row to the reducer that owns
  * its group; this `TypedImperativeAggregate` runs partial aggregation
  * map-side, so each map task ships at most k pairs per group — at 100 TB
  * of KNN candidates that is the difference between shuffling the
  * candidate set and shuffling k·probes rows. Memory is O(k) per group
  * (bounded min-heap), merge is associative and commutative.
  */
case class TopKPairs(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, "top_k_pairs requires k > 0")

  // "worst-first" order: the heap head is the pair that loses to every
  // other kept pair (lowest score; among equal scores, largest id).
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
      e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending under worstFirst = best pair first (worse compares greater)
    val best = buf.toArray.sorted(worstFirst)
    new GenericArrayData(best.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(left = newLeft, right = newRight)
}

object TopKPairs {
  /** Column API: `top_k_pairs($"score", $"id", 10)` → the 10 best
    * (score desc, id asc) pairs as array<struct<score,id>>, best-first. */
  def top_k_pairs(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKPairs(ColumnBridge.expression(score.cast("double")),
        ColumnBridge.expression(id.cast("long")), k).toAggregateExpression())
}
