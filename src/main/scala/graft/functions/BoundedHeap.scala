package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate

/** Shared machinery for bounded-top-k `TypedImperativeAggregate`s
  * ([[TopKDouble]], [[TopKPairs]]): a k-bounded heap whose head is the
  * WORST kept element, an `offer` that evicts it when a better one
  * arrives, associative-commutative merge, and length-prefixed serde.
  *
  * Subclasses define the element ordering (`worstFirst` — "worse" compares
  * GREATER, so ascending sort is best-first) and the element codec. The
  * comparator-based evict means NaN handling follows the same total order
  * Spark's sort uses (NaN above every double), keeping the aggregate
  * equivalent to the `row_number window` formulation it replaces.
  */
// NB: deliberately constructor-less and field-less — Java serialization of
// the concrete case classes requires every non-serializable ancestor to
// have a no-arg constructor.
abstract class BoundedHeapAggregate[E]
  extends TypedImperativeAggregate[mutable.PriorityQueue[E]] {

  def k: Int
  protected def worstFirst: Ordering[E]
  protected def writeElem(out: DataOutputStream, e: E): Unit
  protected def readElem(in: DataInputStream): E

  final override def createAggregationBuffer(): mutable.PriorityQueue[E] =
    mutable.PriorityQueue.empty[E](worstFirst)

  protected final def offer(buf: mutable.PriorityQueue[E], e: E): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }
  }

  final override def merge(buf: mutable.PriorityQueue[E],
      other: mutable.PriorityQueue[E]): mutable.PriorityQueue[E] = {
    other.foreach(offer(buf, _))
    buf
  }

  /** Kept elements, best first. */
  protected final def bestFirst(buf: mutable.PriorityQueue[E]): Seq[E] =
    buf.toList.sorted(worstFirst)

  final override def serialize(buf: mutable.PriorityQueue[E]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(writeElem(out, _))
    out.flush()
    bos.toByteArray
  }

  final override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[E] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue(readElem(in)); i += 1 }
    buf
  }
}
