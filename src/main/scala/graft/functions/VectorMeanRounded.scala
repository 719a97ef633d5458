package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Aggregation buffer: exact per-dimension sums of scale-`s` unscaled
  * integers — a Long fast path per lane that spills into a BigInteger
  * before it can overflow (the DataOps.ExactAcc discipline), plus the
  * row count. `sums == null` until the first vector fixes the
  * dimensionality. */
final class VectorMeanRoundedBuffer(
    var count: Long, var sums: Array[Long], var bigs: Array[BigInteger])

/** `vector_mean_rounded(v, mult, scale)` — BIT-IDENTICAL to
  * `vector_mean(transform(v, e => round(e * mult, scale)))` on the
  * ≤ 15-significant-digit domain documented below, fused:
  *
  *   - the per-element work (multiply, Spark `round` semantics, decimal
  *     quantization) runs in one primitive loop inside the aggregate's
  *     update instead of an interpreted higher-order `transform`
  *     (ArrayTransform is CodegenFallback: per-element boxed lambda
  *     dispatch through a Catalyst `Round`, and the HOF splits the
  *     surrounding whole-stage-codegen span);
  *   - because every rounded element is an EXACT scale-`scale` decimal,
  *     its unscaled value is a Long (|x·10^s| < 2^62 enforced), and the
  *     decimal sum [[VectorMeanDecimal]] computes is reproduced by exact
  *     integer addition — a Long per lane with BigInteger spill, never a
  *     BigDecimal.add per element.
  *
  * Value-equality argument (spec-gated elementwise in
  * FunctionsSpec): Spark's `round(x, s)` on DoubleType is
  * `BigDecimal.valueOf(x).setScale(s, HALF_UP)` re-read as double —
  * exactly what update() computes, keeping only the unscaled integer;
  * the final scale-20 HALF_UP division by the count is performed on the
  * exact integer total, matching the BigDecimal path digit-for-digit.
  *
  * Equivalence DOMAIN: the bit-identity holds for rounded values of
  * ≤ 15 significant digits (|x·10^s| < 10^15). Inside that range the
  * composed path's double re-entry (`...setScale(s).toDouble`, then
  * `BigDecimal.valueOf` again inside vector_mean) round-trips exactly,
  * because shortest-repr recovers ≤ 15-digit decimals; the fused path
  * keeps the unscaled integer and never re-enters. The Long-lane
  * overflow guard admits |x·10^s| up to 2^62 (~19 digits) — that bound
  * protects the SUM, not the equivalence: a 16-17-digit rounded value
  * (e.g. |x| ≥ 1e10 at scale 6) is representable but may not survive
  * the composed path's double hop, and there the fused result is the
  * MORE exact one (it sums the true HALF_UP lattice points), i.e. the
  * two paths can legitimately differ in the last ulp. Engine call sites
  * are 4-9 orders of magnitude inside the 15-digit domain (unit-norm
  * embeddings rounded at 6 dp → ≤ 7 significant digits; PCA projection
  * products at 9 dp → ≤ 13).
  *
  * This is the engine's k-means / PCA inner loop ([[Ivf.kmeans]],
  * [[graft.operators.Pca.fit]]): corpus × dim × k rounded products per
  * iteration, where the HOF formulation measurably IS the runtime.
  * Same contract as [[VectorMeanDecimal]] otherwise: null vectors skip,
  * mixed dimensionalities throw, all-null group returns null. A null
  * multiplier also skips its row (a null projection has no defined
  * contribution — the composed HOF form would degenerate instead).
  */
case class VectorMeanRounded(left: Expression, right: Expression,
    scale: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMeanRoundedBuffer]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  // analysis-time coercion: a SQL numeric literal multiplier (DECIMAL)
  // or an int column casts to double here instead of CCE'ing in update
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), DoubleType)

  require(scale >= 0 && scale <= 15,
    s"vector_mean_rounded: scale $scale outside [0, 15] — larger scales " +
      "overflow the per-element Long unscaled representation")

  // spill to BigInteger when |acc| crosses 2^62: each added term is
  // bounded by longValueExact (≤ 2^63-1), and the check runs per add,
  // so the Long lane can never wrap between checks for terms < 2^62
  private val SpillAt: Long = 1L << 62

  override def createAggregationBuffer(): VectorMeanRoundedBuffer =
    new VectorMeanRoundedBuffer(0L, null, null)

  override def update(buf: VectorMeanRoundedBuffer, input: InternalRow): VectorMeanRoundedBuffer = {
    val v = left.eval(input)
    val m = right.eval(input)
    if (v != null && m != null) {
      val xs = v.asInstanceOf[ArrayData]
      val mult = m.asInstanceOf[Double]
      val n = xs.numElements()
      if (buf.sums == null) {
        buf.sums = new Array[Long](n)
        buf.bigs = new Array[BigInteger](n)
      } else if (buf.sums.length != n)
        throw new IllegalStateException(
          s"vector_mean_rounded: mixed dimensionalities in one group " +
            s"(${buf.sums.length} vs $n)")
      var i = 0
      while (i < n) {
        // round(x * mult, scale) in Spark's Round semantics — shortest
        // decimal repr (valueOf), then HALF_UP at `scale`; keep the
        // unscaled integer (the rounded double itself re-enters
        // losslessly at these scales, so the sum over unscaled integers
        // IS the decimal sum vector_mean computes)
        val term = JBigDecimal.valueOf(xs.getDouble(i) * mult)
          .setScale(scale, RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
        // single-term bound: with |term| < 2^62 and the retained lane
        // < 2^62 (spill invariant), the add below cannot wrap
        if (term >= SpillAt || term <= -SpillAt)
          throw new ArithmeticException(
            s"vector_mean_rounded: |element·10^$scale| ≥ 2^62 — input " +
              "magnitude outside the Long fast-path contract")
        val acc = buf.sums(i) + term
        if (acc >= SpillAt || acc <= -SpillAt) {
          val b = BigInteger.valueOf(acc)
          buf.bigs(i) = if (buf.bigs(i) == null) b else buf.bigs(i).add(b)
          buf.sums(i) = 0L
        } else buf.sums(i) = acc
        i += 1
      }
      buf.count += 1
    }
    buf
  }

  override def merge(buf: VectorMeanRoundedBuffer, other: VectorMeanRoundedBuffer): VectorMeanRoundedBuffer = {
    if (other.sums != null) {
      if (buf.sums == null) {
        buf.sums = other.sums; buf.bigs = other.bigs; buf.count = other.count
      } else {
        if (buf.sums.length != other.sums.length)
          throw new IllegalStateException(
            s"vector_mean_rounded: mixed dimensionalities in one group " +
              s"(${buf.sums.length} vs ${other.sums.length})")
        var i = 0
        while (i < buf.sums.length) {
          val acc = buf.sums(i) + other.sums(i) // both < 2^62: no wrap
          if (acc >= SpillAt || acc <= -SpillAt) {
            val b = BigInteger.valueOf(acc)
            buf.bigs(i) = if (buf.bigs(i) == null) b else buf.bigs(i).add(b)
            buf.sums(i) = 0L
          } else buf.sums(i) = acc
          if (other.bigs(i) != null)
            buf.bigs(i) =
              if (buf.bigs(i) == null) other.bigs(i)
              else buf.bigs(i).add(other.bigs(i))
          i += 1
        }
        buf.count += other.count
      }
    }
    buf
  }

  override def eval(buf: VectorMeanRoundedBuffer): Any =
    if (buf.sums == null) null
    else {
      val c = JBigDecimal.valueOf(buf.count)
      val out = new Array[Double](buf.sums.length)
      var i = 0
      while (i < buf.sums.length) {
        var total = BigInteger.valueOf(buf.sums(i))
        if (buf.bigs(i) != null) total = total.add(buf.bigs(i))
        // the exact scale-`scale` decimal sum, divided at scale 20
        // HALF_UP — digit-identical to VectorMeanDecimal's
        // (scale-20-padded sums).divide(count, 20, HALF_UP)
        out(i) = new JBigDecimal(total, scale)
          .divide(c, 20, RoundingMode.HALF_UP).doubleValue()
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(buf: VectorMeanRoundedBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    if (buf.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buf.sums.length)
      var i = 0
      while (i < buf.sums.length) {
        out.writeLong(buf.sums(i))
        val b = buf.bigs(i)
        if (b == null) out.writeInt(-1)
        else {
          val bytes = b.toByteArray
          out.writeInt(bytes.length)
          out.write(bytes)
        }
        i += 1
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VectorMeanRoundedBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val count = in.readLong()
    val n = in.readInt()
    if (n < 0) new VectorMeanRoundedBuffer(count, null, null)
    else {
      val sums = new Array[Long](n)
      val bigs = new Array[BigInteger](n)
      var i = 0
      while (i < n) {
        sums(i) = in.readLong()
        val len = in.readInt()
        if (len >= 0) {
          val b = new Array[Byte](len)
          in.readFully(b)
          bigs(i) = new BigInteger(b)
        }
        i += 1
      }
      new VectorMeanRoundedBuffer(count, sums, bigs)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMeanRounded =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMeanRounded =
    copy(inputAggBufferOffset = newOffset)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorMeanRounded =
    copy(left = newLeft, right = newRight)
}

object VectorMeanRounded {
  /** Column API: `vector_mean_rounded($"v", $"d", 9)` ≡
    * `vector_mean(transform($"v", e => round(e * $"d", 9)))`, fused.
    * Pass `lit(1.0)` as `mult` for a plain elementwise round
    * (x·1.0 ≡ x bit-for-bit, including -0.0 and NaN). */
  def vector_mean_rounded(v: Column, mult: Column, scale: Int): Column =
    ColumnBridge.column(
      VectorMeanRounded(ColumnBridge.expression(v),
        ColumnBridge.expression(mult), scale).toAggregateExpression())
}
