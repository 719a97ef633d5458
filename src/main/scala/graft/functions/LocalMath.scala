package graft.functions

/** Driver-side twins of the engine's deterministic numeric kernels, for
  * the size-gated driver-local lanes (the [[graft.operators.Ivf.kmeans]]
  * centroid-localization pattern generalized): a bounded relation is
  * collected once and an iterative kernel runs as plain JVM code instead
  * of one Spark job per round. Each function here replicates the exact
  * semantics of a plan-side expression, so a local lane is BIT-IDENTICAL
  * to its distributed twin (spec-gated per lane):
  *
  *  - [[roundHalfUp]] ≡ `round(col, scale)` on DoubleType: Spark's
  *    RoundBase evaluates `BigDecimal(d).setScale(scale, HALF_UP)` with
  *    the scala constructor wrapping `java.math.BigDecimal.valueOf`
  *    (Double.toString-based) — replicated verbatim.
  *  - [[dotLR]] ≡ [[VectorExprs.dot_double]]: left-to-right
  *    `acc + x*y` fold over doubles.
  *  - [[scaled]]/[[unscale]] ≡ `cast(double as decimal(38,s))` +
  *    decimal SUM + `cast(decimal as double)`: the cast quantizes via
  *    BigDecimal.valueOf + setScale(HALF_UP) (same as roundHalfUp but
  *    keeping the unscaled integer); decimal addition is exact integer
  *    addition, hence order-independent; the final cast is
  *    BigDecimal.doubleValue. Magnitudes ≤ ~1 at scale ≤ 28 exceed a
  *    Long, so sums ride BigInteger ([[graft.operators.DataOps.ExactAcc]]
  *    is the spill-optimized plan-side twin of the same arithmetic).
  */
object LocalMath {
  def roundHalfUp(v: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  def dotLR(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** `cast(v as decimal(38,scale))`, as the exact unscaled integer. */
  def scaled(v: Double, scale: Int): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v)
      .setScale(scale, java.math.RoundingMode.HALF_UP)

  /** `cast(sum as double)` for an exact decimal accumulator. */
  def toDouble(sum: java.math.BigDecimal): Double = sum.doubleValue()
}
