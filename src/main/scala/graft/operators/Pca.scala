package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorMeanRounded.vector_mean_rounded
import graft.functions.VectorExprs

/** Principal component analysis over an embedding column by
  * SUBSPACE (block power) iteration — the dimensionality-reduction /
  * whitening step an embedding pipeline runs before indexing or
  * clustering (e02's random projection is the data-independent cousin;
  * PCA is the variance-optimal one).
  *
  * Shape, per iteration: ONE corpus pass computes all k candidate
  * directions together — per row, the k projections `d_j = x̃·v_j`
  * (codegen'd dot folds) scale the centered vector, and k
  * `vector_mean` aggregates reduce them map-side into k
  * (count, dim-decimals) buffers; the driver then Gram-Schmidt
  * re-orthonormalizes the k×dim result (k·dim doubles — a bounded
  * model scalar, the t25 convention). Vectors never shuffle; the
  * exchange per pass is k buffers per map task. A per-component loop
  * would cost k× the passes for the same arithmetic.
  *
  * Determinism: the seed directions are a fixed LCG (the s02
  * hyperplane generator's constants), the iteration count is FIXED
  * (convergence tests would make the pass count data-dependent),
  * every cross-row sum runs through the scale-20 decimal
  * `vector_mean` accumulator, and the driver-side Gram-Schmidt is
  * sequential IEEE arithmetic — so components, eigenvalues, and
  * everything downstream are bit-identical under any partitioning
  * (spec-gated). Eigenvalue signs: a principal DIRECTION is only
  * defined up to sign; callers comparing components must compare
  * |cosine| (the spec does).
  */
object Pca {

  /** Fitted model: orthonormal components (k×dim, row-major),
    * eigenvalues (variance along each component, descending by
    * construction after enough iterations), and the total variance
    * (mean squared centered norm). */
  final case class PcaModel(
      mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double], totalVariance: Double)

  private def litVec(v: Array[Double]): Column = array(v.map(lit): _*)

  /** The initial (pre-data) orthonormal basis — `orthonormalize(seeds)`
    * computed driver-side from constants only. Exposed so the DuckDB
    * oracle interpolates the EXACT doubles the fit starts from (the
    * minhashPermSqlValues single-sourcing convention: one Scala
    * definition, literal in the SQL). */
  private[graft] def initComponents(k: Int, dim: Int): Array[Array[Double]] =
    orthonormalize(seeds(k, dim))

  /** Deterministic seed directions (same LCG as the LSH hyperplanes). */
  private def seeds(k: Int, dim: Int): Array[Array[Double]] = {
    var s = 41L
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Array.fill(k, dim)(next())
  }

  /** Sequential Gram-Schmidt orthonormalization, in component order —
    * deterministic given deterministic input. Degenerate (near-zero
    * residual) directions throw: k must not exceed the data's rank. */
  private def orthonormalize(w: Array[Array[Double]]): Array[Array[Double]] = {
    val out = Array.ofDim[Array[Double]](w.length)
    for (j <- w.indices) {
      val v = w(j).clone()
      for (p <- 0 until j) {
        var d = 0.0
        var i = 0
        while (i < v.length) { d += v(i) * out(p)(i); i += 1 }
        i = 0
        while (i < v.length) { v(i) -= d * out(p)(i); i += 1 }
      }
      var n2 = 0.0
      var i = 0
      while (i < v.length) { n2 += v(i) * v(i); i += 1 }
      val n = math.sqrt(n2)
      require(n > 1e-12,
        s"PCA: direction $j collapsed during orthonormalization — " +
          "k exceeds the effective rank of the data")
      i = 0
      while (i < v.length) { v(i) /= n; i += 1 }
      out(j) = v
    }
    out
  }

  /** Fit the top-k principal components of `vecCol` in `iterations`
    * subspace-iteration passes (each ONE aggregation job).
    *
    * Every mean input is rounded to a fixed decimal scale (6dp for the
    * raw-vector mean, 9dp for the per-iteration projection products —
    * fused into `vector_mean_rounded`'s primitive loop)
    * — the e06/d10 oracle-ability trade: rounded inputs make
    * the scale-20 decimal accumulation EXACTLY mirrorable as integer
    * arithmetic in the DuckDB oracle (raw doubles would hinge on
    * cross-engine shortest-repr-to-decimal quantization, which is not a
    * contract either engine publishes). The quantization noise
    * (≤ 5e-10 per projection lane) is far below the iteration's own
    * convergence tolerance; orthonormality is restored exactly by the
    * driver-side Gram-Schmidt every pass. */
  def fit(vecs: DataFrame, k: Int = 3, iterations: Int = 8,
      vecCol: String = "embedding"): PcaModel = {
    val v = vecs.select(Similarity.toDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
    val mu = v.agg(vector_mean_rounded(col("v"), lit(1.0), 6).as("mu"))
      .head().getSeq[Double](0).toArray
    val centered = v.select(
      zip_with(col("v"), litVec(mu), (a, b) => a - b).as("vc"))

    var comps = orthonormalize(seeds(k, mu.length))
    for (_ <- 0 until iterations) {
      val aggs = comps.zipWithIndex.map { case (c, j) =>
        val d = VectorExprs.dot_double(col("vc"), litVec(c))
        vector_mean_rounded(col("vc"), d, 9).as(s"w$j")
      }
      val row = centered.agg(aggs.head, aggs.tail: _*).head()
      comps = orthonormalize(
        Array.tabulate(k)(j => row.getSeq[Double](j).toArray))
    }

    // One more pass for the spectrum: variance along each component
    // (decimal-summed squared projections) and the total variance.
    val evAggs = comps.zipWithIndex.map { case (c, j) =>
      val d = VectorExprs.dot_double(col("vc"), litVec(c))
      (sum(round(d * d, 9).cast("decimal(30,12)")).cast("double") /
        count(lit(1))).as(s"ev$j")
    } :+ (sum(round(VectorExprs.dot_double(col("vc"), col("vc")), 9)
      .cast("decimal(30,12)")).cast("double") /
      count(lit(1))).as("total")
    val evRow = centered.agg(evAggs.head, evAggs.tail: _*).head()
    val evs = Array.tabulate(k)(j => evRow.getDouble(j))

    // Subspace iteration converges the INVARIANT SUBSPACE; order the
    // basis by measured variance so component 1 is the principal one.
    val order = evs.zipWithIndex.sortBy { case (e, j) => (-e, j) }.map(_._2)
    PcaModel(mu, order.map(comps(_)), order.map(evs(_)),
      evRow.getDouble(k))
  }

  /** Driver query: one row per component — eigenvalue, explained
    * variance fraction, and the dominant input dimension (csv-safe
    * scalars; components themselves are model output, not a relation).
    * EXACTLY oracled (DataOps.e07Sql): 8 subspace-iteration passes
    * unrolled as CTEs, the e06 fixed-iteration convention — plus gated
    * by PcaSpec (planted anisotropy, orthonormality, invariance). */
  def pcaQuery(vecs: DataFrame, k: Int = 3): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val m = fit(vecs, k)
    m.components.toIndexedSeq.zipWithIndex.map { case (c, j) =>
      val top = c.indices.maxBy(i => (math.abs(c(i)), -i))
      (j + 1, m.eigenvalues(j),
        math.round(m.eigenvalues(j) / m.totalVariance * 1e6) / 1e6.toDouble,
        top)
    }.toDF("component", "eigenvalue", "explained_frac", "top_dim")
      .withColumn("eigenvalue", round($"eigenvalue", 6))
  }
}
