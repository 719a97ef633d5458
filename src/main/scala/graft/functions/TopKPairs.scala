package graft.functions

import java.io.{DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
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
  * This is the aggregate formulation of per-group top-k re-ranking
  * ([[BoundedHeapAggregate]]). The window formulation (`row_number()
  * OVER (PARTITION BY g ORDER BY score DESC) <= k`) must shuffle EVERY
  * candidate row to the reducer that owns its group; this aggregate runs
  * partial aggregation map-side, so each map task ships at most k pairs
  * per group — at 100 TB of KNN candidates that is the difference between
  * shuffling the candidate set and shuffling k·probes rows.
  */
case class TopKPairs(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends BoundedHeapAggregate[(Double, Long)] with BinaryLike[Expression] {

  require(k > 0, "top_k_pairs requires k > 0")

  // worse = lower score; among equal scores, larger id
  override protected val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override protected def writeElem(out: DataOutputStream,
      e: (Double, Long)): Unit = {
    out.writeDouble(e._1); out.writeLong(e._2)
  }
  override protected def readElem(in: DataInputStream): (Double, Long) =
    (in.readDouble(), in.readLong())

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any =
    new GenericArrayData(bestFirst(buf).map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })

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
