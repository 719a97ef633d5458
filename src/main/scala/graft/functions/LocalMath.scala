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

  /** Driver-side twin of one [[VectorMeanRounded]] aggregation buffer:
    * per element, `BigDecimal.valueOf(x·mult).setScale(scale, HALF_UP)`
    * kept as the unscaled integer; exact Long sums with BigInteger
    * spill (the aggregate's invariants verbatim, including the 2^62
    * single-term bound); [[mean]] performs the same scale-20 HALF_UP
    * division by the row count. Used by the size-gated local lanes
    * (Pca.fit, Pq.trainCodebooks) so their means are bit-identical to
    * the plan-side aggregate. */
  final class MeanRoundedAcc(dim: Int, scale: Int) {
    private val Spill = 1L << 62
    private val sums = new Array[Long](dim)
    private val bigs = new Array[java.math.BigInteger](dim)
    var count: Long = 0L
    def add(x: Array[Double], mult: Double): Unit = {
      if (x.length != dim)
        throw new IllegalStateException(
          s"vector_mean_rounded: mixed dimensionalities in one group " +
            s"($dim vs ${x.length})")
      var i = 0
      while (i < dim) {
        val term = java.math.BigDecimal.valueOf(x(i) * mult)
          .setScale(scale, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
        if (term >= Spill || term <= -Spill)
          throw new ArithmeticException(
            s"vector_mean_rounded: |element·10^$scale| ≥ 2^62 — input " +
              "magnitude outside the Long fast-path contract")
        val acc = sums(i) + term
        if (acc >= Spill || acc <= -Spill) {
          val b = java.math.BigInteger.valueOf(acc)
          bigs(i) = if (bigs(i) == null) b else bigs(i).add(b)
          sums(i) = 0L
        } else sums(i) = acc
        i += 1
      }
      count += 1
    }
    def mean(): Array[Double] = {
      val c = java.math.BigDecimal.valueOf(count)
      Array.tabulate(dim) { i =>
        var tot = java.math.BigInteger.valueOf(sums(i))
        if (bigs(i) != null) tot = tot.add(bigs(i))
        new java.math.BigDecimal(tot, scale)
          .divide(c, 20, java.math.RoundingMode.HALF_UP).doubleValue()
      }
    }
  }
}
