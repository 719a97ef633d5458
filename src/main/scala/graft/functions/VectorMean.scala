package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Aggregation buffer: exact elementwise decimal sums + row count.
  * `sums == null` until the first vector fixes the dimensionality. */
final class VectorMeanBuffer(
    var count: Long, var sums: Array[JBigDecimal])

/** `vector_mean(v)` — elementwise mean of an `array<double>` column as
  * one mergeable aggregate: each element is quantized to scale 20
  * (HALF_UP, mirroring `cast(x AS DECIMAL(38,20))`) and summed EXACTLY
  * in a per-group decimal accumulator, so the result is deterministic
  * under any partitioning, merge order, and retry — the property the
  * k-means centroid update needs (a plain double mean drifts with
  * accumulation order and would make centroids, and therefore every
  * IVF cell assignment downstream, partitioning-dependent).
  *
  * Scale rationale: the posexplode formulation (`posexplode(v)` →
  * `groupBy(cell, dim)` decimal mean → re-collect the array) shuffles
  * corpus×dim rows per k-means iteration — a 64× inflation at our
  * embedding width. This aggregate partial-aggregates whole vectors
  * map-side and ships ONE (count, 64-decimal) buffer per (partition,
  * cell), collapsing two shuffles and the array reassembly into one
  * hash aggregation.
  *
  * Mixed dimensionalities in one group throw (fail-fast — a silent
  * ragged mean would corrupt every downstream distance); null vectors
  * are skipped like null scalars in AVG; an all-null group returns null.
  */
case class VectorMeanDecimal(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMeanBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): VectorMeanBuffer =
    new VectorMeanBuffer(0L, null)

  override def update(buf: VectorMeanBuffer, input: InternalRow): VectorMeanBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val xs = v.asInstanceOf[ArrayData]
      val n = xs.numElements()
      if (buf.sums == null) buf.sums = Array.fill(n)(JBigDecimal.ZERO)
      else if (buf.sums.length != n)
        throw new IllegalStateException(
          s"vector_mean: mixed dimensionalities in one group " +
            s"(${buf.sums.length} vs $n)")
      var i = 0
      while (i < n) {
        // mirror cast(double AS DECIMAL(38,20)): decimal text value,
        // quantized HALF_UP — then EXACT addition (no precision loss)
        buf.sums(i) = buf.sums(i).add(
          JBigDecimal.valueOf(xs.getDouble(i)).setScale(20, RoundingMode.HALF_UP))
        i += 1
      }
      buf.count += 1
    }
    buf
  }

  override def merge(buf: VectorMeanBuffer, other: VectorMeanBuffer): VectorMeanBuffer = {
    if (other.sums != null) {
      if (buf.sums == null) { buf.sums = other.sums; buf.count = other.count }
      else {
        if (buf.sums.length != other.sums.length)
          throw new IllegalStateException(
            s"vector_mean: mixed dimensionalities in one group " +
              s"(${buf.sums.length} vs ${other.sums.length})")
        var i = 0
        while (i < buf.sums.length) {
          buf.sums(i) = buf.sums(i).add(other.sums(i)); i += 1
        }
        buf.count += other.count
      }
    }
    buf
  }

  override def eval(buf: VectorMeanBuffer): Any =
    if (buf.sums == null) null
    else {
      val c = JBigDecimal.valueOf(buf.count)
      new GenericArrayData(buf.sums.map(s =>
        s.divide(c, 20, RoundingMode.HALF_UP).doubleValue()))
    }

  override def serialize(buf: VectorMeanBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    if (buf.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buf.sums.length)
      buf.sums.foreach { s =>
        // fixed scale 20 by construction; ship the unscaled integer
        val bytes = s.unscaledValue().toByteArray
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VectorMeanBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val count = in.readLong()
    val n = in.readInt()
    if (n < 0) new VectorMeanBuffer(count, null)
    else {
      val sums = new Array[JBigDecimal](n)
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        sums(i) = new JBigDecimal(new java.math.BigInteger(b), 20)
        i += 1
      }
      new VectorMeanBuffer(count, sums)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMeanDecimal =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMeanDecimal =
    copy(inputAggBufferOffset = newOffset)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): VectorMeanDecimal =
    copy(child = newChild)
}

object VectorMean {
  /** Column API: `vector_mean($"v")` over `array<double>` groups. */
  def vector_mean(c: Column): Column =
    ColumnBridge.column(
      VectorMeanDecimal(ColumnBridge.expression(c)).toAggregateExpression())
}
