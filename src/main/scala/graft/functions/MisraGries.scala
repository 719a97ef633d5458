package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a native aggregate:
  * `misra_gries(item, k)` maintains at most k−1 (item, count) pairs and
  * returns the surviving candidates as `array<struct<item string,
  * est bigint>>`, item-sorted.
  *
  * Guarantees (the classic MG bound, preserved under arbitrary merge
  * order — Agarwal et al., "Mergeability of Summaries", PODS 2012): for
  * any item with true frequency f over a stream of n items,
  * f − n/k ≤ est ≤ f. Hence every item with f > n/k SURVIVES in the
  * summary regardless of partitioning or merge order — the summary is a
  * guaranteed candidate superset for any threshold above n/k, even
  * though the individual `est` values are order-dependent. Consumers
  * must treat the summary as a candidate PROPOSAL and verify exactly
  * (the two-pass heavy-hitters algorithm): pass 1 aggregates k-bounded
  * state map-side (partial aggregation — each map task ships ≤ k−1
  * pairs), pass 2 counts only the ≤ k−1 candidates exactly via a
  * broadcast filter. Neither pass materializes vocabulary-sized state
  * per task, which is the point at a 100 TB n-gram stream whose vocab
  * does not fit anywhere.
  *
  * update: tracked items increment; an unseen item on a full summary
  * decrements ALL counters by one and drops zeros (amortized O(1): each
  * full decrement destroys k counts and the stream only adds n).
  * merge: pointwise sum, then subtract the k-th largest counter and
  * drop non-positives when over capacity (the mergeability construction
  * from the paper).
  */
case class MisraGries(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 1, "misra_gries requires k > 1")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString // copy out of the row
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < k - 1 => buf.update(s, 1L)
        case None => // full: decrement everything, drop zeros (MG step)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf.update(key, c - 1L)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    if (buf.size > k - 1) {
      // subtract the k-th largest counter from all; at most k-1 stay > 0
      val d = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (key, c) =>
        if (c - d <= 0L) dead += key else buf.update(key, c - d)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.toArray.sortBy(_._1).map { case (s, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(s), c))
    })

  // length-prefixed raw UTF-8, NOT writeUTF: items are arbitrary stream
  // values (t27 feeds raw tokens, q64 feeds stringified join keys) and
  // writeUTF throws UTFDataFormatException past 65535 encoded bytes —
  // one unbroken base64 blob in a crawled document would crash the
  // aggregation at partial-buffer serialization
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** Column API: `misra_gries($"item", 2048)` → candidate frequent items
    * as array<struct<item,est>>, item-sorted. Estimates are
    * order-dependent (bounded by f − n/k ≤ est ≤ f); only the candidate
    * SET carries the superset guarantee — verify exactly downstream. */
  def misra_gries(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(item.cast("string")), k)
        .toAggregateExpression())
}
