package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TopKPairs.top_k_pairs

/** One packed block of vectors for the blocked all-pairs kernel
  * ([[Similarity.allPairsCosine]]): ids sorted ascending within the
  * block, vectors flattened into one primitive array (`offs` is the
  * prefix index — per-row lengths may differ and a mismatched pair is
  * skipped, matching the fold expressions' NULL contract), norms
  * precomputed by the SAME codegen'd fold the row form uses. */
private[graft] case class VecBlock(
    b: Int, ids: Array[Long], offs: Array[Int],
    flat: Array[Double], nrms: Array[Double])

/** A joined (block, block) work unit: every vector pair across the two
  * blocks (or the i<j triangle when bx == by) is scored by one task. */
private[graft] case class VecBlockPair(
    bx: Int, by: Int,
    idsX: Array[Long], offsX: Array[Int],
    flatX: Array[Double], nrmsX: Array[Double],
    idsY: Array[Long], offsY: Array[Int],
    flatY: Array[Double], nrmsY: Array[Double])

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  *   - bruteKnn: exact cosine top-k — broadcast the (small) probe set over
  *     the corpus; one pass, no shuffle of the corpus itself; top-k via a
  *     partitioned window on the probe key.
  *   - lshKnn: random-hyperplane LSH — corpus is bucketed by sign-bit
  *     signature; probes only scan their own bucket(s). This is the 100 TB
  *     path: the full-corpus scan is replaced by an equi-join on bucket id.
  *
  * All vector math runs through the native codegen'd fold expressions in
  * [[graft.functions.VectorExprs]] — deterministic left-to-right
  * summation (the same order DuckDB's list functions use, so oracles
  * match bit-for-bit) in a primitive fused loop.
  */
object Similarity {

  /** Elementwise-cast to double; float→double is exact. */
  def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Native codegen'd dot product ([[graft.functions.DotProductDouble]]):
    * same left-to-right doubles as the higher-order-function form (and as
    * DuckDB's list_dot_product, so value-exact oracles hold), but a
    * primitive fused loop instead of an interpreted boxed fold — on
    * pairwise scoring this is most of the runtime. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dot_double(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Per-probe top-k re-rank via the native [[graft.functions.TopKPairs]]
    * aggregate: partial aggregation ships at most k (score, id) pairs per
    * probe per MAP task, where the window formulation
    * (`row_number() OVER (PARTITION BY probe_id ...)`) would shuffle every
    * candidate row. Ordering is identical: score desc, id asc.
    *
    * Null-similarity candidates (a corrupt/truncated vector — see the
    * VectorExprs length-mismatch contract) are EXCLUDED from KNN results
    * by explicit filter, as a documented contract rather than an
    * aggregate accident: a nonsense neighbor is worse than a missing
    * one. Pipelines wanting to QUARANTINE corrupt vectors should scan
    * for `dot(v, v) IS NULL` upstream, where the null is conspicuous. */
  private[operators] def rerankTopK(cands: DataFrame, k: Int): DataFrame =
    cands
      .filter(col("cos_sim").isNotNull)
      .groupBy(col("probe_id"))
      .agg(top_k_pairs(col("cos_sim"), col("vec_id"), k).as("__top"))
      .select(col("probe_id"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("probe_id"), col("__e.id").as("vec_id"),
        col("__e.score").as("cos_sim"), (col("__pos") + 1).as("rnk"))

  /** Exact cosine top-k for each probe row. `probes` must be small (it is
    * broadcast); the corpus side streams — no corpus shuffle at all: the
    * per-probe top-k is a partial-aggregating heap, so each map task emits
    * k pairs per probe and the exchange moves k·probes rows total.
    * Similarity is rounded to 9 dp and tie-broken by corpus id so the
    * result is a deterministic set. */
  def bruteKnn(corpus: DataFrame, probes: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms once per vector, not per (probe, vector) pair
    val c = corpus.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("v_nrm", norm(col("v")))
    val p = probes.select(col(idCol).as("probe_id"), toDouble(col(vecCol)).as("q"))
      .withColumn("q_nrm", norm(col("q")))
    val scored = c.crossJoin(broadcast(p))
      .withColumn("cos_sim",
        round(dot(col("q"), col("v")) / (col("q_nrm") * col("v_nrm")), 9))
      .filter(col("probe_id") =!= col("vec_id"))
    rerankTopK(scored, k)
  }

  /** The hyperplane doubles as raw arrays — the ONE definition of the
    * LCG constants, exposed so the s02 oracle interpolates the EXACT
    * doubles the engine hashes with (the minhashPermSqlValues
    * single-sourcing convention: a seed or formula tweak can never
    * silently de-sync the two engines). */
  private[operators] def hyperplaneValues(
      numPlanes: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Array.fill(numPlanes, dim)(next())
  }

  /** Deterministic pseudo-random hyperplanes (LCG, fixed seed): one
    * array<double> literal per plane. */
  private def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 7L): Seq[Column] =
    hyperplaneValues(numPlanes, dim, seed).toSeq
      .map(p => array(p.toSeq.map(lit): _*))

  /** Sign-bit signature: bit i = [v · plane_i > 0]. */
  def lshSignature(v: Column, planes: Seq[Column]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, p) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce[Column]((a, b) => a.bitwiseOR(b))

  /** Approximate top-k: candidates = corpus rows whose signature is within
    * `maxHamming` sign-bit flips of the probe's (joined per matching band
    * chunk, pigeonhole-style), exact cosine rerank inside the candidate
    * set. Recall < 1 by construction; the tradeoff knobs are numPlanes /
    * maxHamming / probeFlips.
    *
    * Multi-probe: the PROBE side additionally probes every bucket within
    * `probeFlips` bit flips of its own chunk bucket (the standard
    * multi-probe LSH trick — perturb the query's hash, never re-bucket
    * the corpus). Pigeonhole guarantee widens from "some chunk matches
    * exactly when total distance ≤ chunks−1" to: a corpus vector within
    * `chunks·(probeFlips+1) − 1` total sign-bit flips of the probe shares
    * a probed bucket in at least one chunk. Fan-out cost is per-PROBE
    * only — `chunks · Σ_{i≤probeFlips} C(width, i)` bucket lookups
    * (e.g. 4·5 = 20 at the 16-plane default) — while the corpus keeps
    * exactly one row per chunk, so the index size and the 100 TB scan
    * shape are unchanged. */
  def lshKnn(corpus: DataFrame, probes: DataFrame, k: Int, dim: Int,
      numPlanes: Int = 16, maxHamming: Int = 3, probeFlips: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val chunks = maxHamming + 1
    val width = math.max(1, numPlanes / chunks)
    // All XOR masks of ≤ probeFlips bits inside one chunk (subset
    // enumeration at plan-build time; width ≤ 64 so this is tiny).
    val masks: Seq[Long] = {
      def combos(bits: List[Int], f: Int): Seq[Long] =
        if (f == 0) Seq(0L)
        else bits match {
          case Nil => Seq(0L)
          case b :: rest =>
            combos(rest, f) ++ combos(rest, f - 1).map(_ | (1L << b))
        }
      combos((0 until width).toList, math.min(probeFlips, width)).distinct
    }
    def banded(df: DataFrame, id: String, vec: String, flipMasks: Seq[Long]) = {
      val base = df.select(col(id), toDouble(col(vec)).as(s"${id}_v"),
          lshSignature(toDouble(col(vec)), planes).as(s"${id}_sig"))
        .select(col(id), col(s"${id}_v"),
          posexplode(array((0 until chunks).map(i =>
            shiftrightunsigned(col(s"${id}_sig"), i * width)
              .bitwiseAND((1L << width) - 1)): _*)).as(Seq("chunk", "bucket")))
      if (flipMasks.sizeIs <= 1) base
      else base.select(col(id), col(s"${id}_v"), col("chunk"),
        explode(array(flipMasks.map(m =>
          col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    }
    val c = banded(corpus.select(col(idCol).as("vec_id"), col(vecCol)),
      "vec_id", vecCol, Seq(0L))
    val p = banded(probes.select(col(idCol).as("probe_id"), col(vecCol)),
      "probe_id", vecCol, masks)
    val cands = c.join(p, Seq("chunk", "bucket"))
      .filter(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        col("probe_id_v").as("q"), col("vec_id_v").as("v"))
      // dedupe on the ID pair only — distinct() would hash-shuffle the
      // carried vectors too
      .dropDuplicates("probe_id", "vec_id")
    rerankTopK(
      cands.withColumn("cos_sim", round(cosine(col("q"), col("v")), 9)), k)
  }

  /** EXACT all-pairs cosine ≥ `minCos`, blocked-kernel form.
    *
    * Exact pair search over this corpus is irreducibly all-pairs: the
    * embeddings are near-uniform on the sphere (measured mean pairwise
    * cosine ≈ 0, σ ≈ 1/√dim), so metric pruning (triangle-inequality
    * cell bounds, projection bands) admits ~100% of candidate blocks at
    * any useful threshold — there is nothing to prune, only a kernel to
    * run fast. The row-join form (self-join on `vec_id <`, one codegen'd
    * fold per joined row) pays per-PAIR row overhead: 2·10⁸ joined rows
    * at 20k vectors measured ~200 s. This form packs vectors into
    * ~`blockRows`-sized primitive blocks, joins the O((N/B)²) block-pair
    * relation, and scores each block pair in a tight flat-array loop —
    * the same arithmetic at GEMM shape, with only qualifying pairs ever
    * becoming rows.
    *
    * Exactness and oracle parity:
    *   - the per-pair doubles are BIT-IDENTICAL to the row form: norms
    *     come from the same codegen'd `sqrt(dot(v,v))` column, the
    *     kernel accumulates `acc + x*y` strictly left-to-right (Java
    *     forbids FMA fusion), and products/divisions are commutative
    *     bit-exact, so pair orientation doesn't matter;
    *   - the kernel pre-filters at `minCos − 1e-6` (raw double), then
    *     the FINAL filter applies Spark's own `round(cos, 6) >= minCos`
    *     — any pair that HALF_UP-rounds over the threshold has raw
    *     cos ≥ minCos − 5·10⁻⁷ and survives the pre-filter;
    *   - zero-norm and NULL vectors are dropped up front (the row form
    *     excludes them via NaN/NULL comparisons); length-mismatched
    *     pairs are skipped (the fold expressions' NULL contract).
    *
    * Scale: blocks are hash-assigned (balanced for any id space), the
    * block-pair relation is a tiny int relation joined twice by equi-key
    * — nothing data-scale broadcasts and tasks are independent. Each
    * block is replicated to its N/B partner pairs, so shuffle volume is
    * O(N²·dim/B) — 1/B of the pair count, tunable against task memory
    * (B·dim·8 bytes per block side). The O(N²·dim) compute itself is
    * irreducible: this is the honest exact anchor; d10 is the
    * sub-quadratic production default. */
  /** The shared packing of [[allPairsCosine]] / [[knnCandidatesBlocked]]:
    * vectors → id-hashed row blocks (flat double arrays + norms) →
    * the bx ≤ by block-pair work relation. */
  private def blockPairs(vecs: DataFrame, idCol: String, vecCol: String,
      blockRows: Int): org.apache.spark.sql.Dataset[VecBlockPair] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val n = vecs.count()
    val nBlocks = math.max(1, math.ceil(n.toDouble / blockRows).toInt)
    val e = vecs
      .select(col(idCol).cast("long").as("vec_id"),
        toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .filter(col("v").isNotNull && col("nrm") > 0)
      .withColumn("b", pmod(hash(col("vec_id")), lit(nBlocks)))
    val packed = e.select($"b", $"vec_id", $"v", $"nrm")
      .as[(Int, Long, Array[Double], Double)]
      .groupByKey(_._1)
      .mapGroups { (b, it) =>
        val rows = it.toArray.sortBy(_._2)
        val offs = new Array[Int](rows.length + 1)
        var i = 0
        while (i < rows.length) {
          offs(i + 1) = offs(i) + rows(i)._3.length; i += 1
        }
        val flat = new Array[Double](offs(rows.length))
        i = 0
        while (i < rows.length) {
          System.arraycopy(rows(i)._3, 0, flat, offs(i), rows(i)._3.length)
          i += 1
        }
        VecBlock(b, rows.map(_._2), offs, flat, rows.map(_._4))
      }
    val blocksDf = packed.toDF()
    val blockIds = spark.range(nBlocks).select($"id".cast("int").as("__bid"))
    // bounded relation: nBlocks² ints (nBlocks = N/blockRows)
    val pairRel = blockIds.select($"__bid".as("bx"))
      .crossJoin(blockIds.select($"__bid".as("by")))
      .filter($"bx" <= $"by")
    pairRel
      .join(blocksDf.select($"b".as("bx"), $"ids".as("idsX"),
        $"offs".as("offsX"), $"flat".as("flatX"), $"nrms".as("nrmsX")),
        Seq("bx"))
      .join(blocksDf.select($"b".as("by"), $"ids".as("idsY"),
        $"offs".as("offsY"), $"flat".as("flatY"), $"nrms".as("nrmsY")),
        Seq("by"))
      .select($"bx", $"by", $"idsX", $"offsX", $"flatX", $"nrmsX",
        $"idsY", $"offsY", $"flatY", $"nrmsY")
      .as[VecBlockPair]
  }

  def allPairsCosine(vecs: DataFrame, minCos: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      blockRows: Int = 1024): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val joined = blockPairs(vecs, idCol, vecCol, blockRows)
    val pre = minCos - 1e-6
    val raw = joined.flatMap { p =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      val same = p.bx == p.by
      var i = 0
      while (i < p.idsX.length) {
        val a0 = p.offsX(i)
        val aLen = p.offsX(i + 1) - a0
        val na = p.nrmsX(i)
        val ida = p.idsX(i)
        var j = if (same) i + 1 else 0
        while (j < p.idsY.length) {
          val b0 = p.offsY(j)
          if (p.offsY(j + 1) - b0 == aLen) {
            var acc = 0.0
            var k = 0
            while (k < aLen) {
              acc = acc + p.flatX(a0 + k) * p.flatY(b0 + k); k += 1
            }
            val cos = acc / (na * p.nrmsY(j))
            if (cos >= pre) {
              val idb = p.idsY(j)
              out += (if (ida < idb) (ida, idb, cos) else (idb, ida, cos))
            }
          }
          j += 1
        }
        i += 1
      }
      out
    }.toDF("vec_a", "vec_b", "__cos")
    raw.withColumn("cos_sim", round($"__cos", 6))
      .filter($"cos_sim" >= minCos)
      .select($"vec_a", $"vec_b", $"cos_sim")
  }

  /** A k-bounded best-pair buffer under the [[graft.functions.TopKPairs]]
    * total order (score DESC, id ASC). Linear arrays: k is small (5),
    * replacement recomputes the worst slot in O(k). */
  private final class BoundedPairBuf(k: Int) {
    private val sc = new Array[Double](k)
    private val ident = new Array[Long](k)
    private var n = 0
    private var wi = 0 // index of the worst element once full
    // (s, d) strictly better than slot i under (score DESC, id ASC)
    private def beats(i: Int, s: Double, d: Long): Boolean =
      s > sc(i) || (s == sc(i) && d < ident(i))
    private def recomputeWorst(): Unit = {
      // slot i is worse than slot w iff w's values would beat slot i
      var w = 0
      var i = 1
      while (i < n) { if (beats(i, sc(w), ident(w))) w = i; i += 1 }
      wi = w
    }
    def offer(s: Double, d: Long): Unit =
      if (n < k) {
        sc(n) = s; ident(n) = d; n += 1
        if (n == k) recomputeWorst()
      } else if (beats(wi, s, d)) {
        sc(wi) = s; ident(wi) = d; recomputeWorst()
      }
    /** A RAW (unrounded) cosine strictly below this can never enter the
      * buffer, so the caller may skip the BigDecimal rounding for it —
      * the hot-loop guard that keeps the kernel at d06 speed. Exact by
      * monotonicity of HALF_UP: with the worst kept score s_w (already
      * a 6dp value), only raws ≥ s_w − 5e-7 can round INTO s_w or
      * above; the margin here is a full 1e-6 ulp, so any fp error in
      * the subtraction only makes the guard more conservative (a few
      * extra roundings, never a lost candidate). −2 while not full:
      * cosines live in [−1, 1], so nothing is skipped until k kept. */
    def floorHint: Double = if (n < k) -2.0 else sc(wi) - 1e-6
    def emit(probe: Long,
        out: scala.collection.mutable.ArrayBuffer[(Long, Long, Double)])
        : Unit = {
      var i = 0
      while (i < n) { out += ((probe, ident(i), sc(i))); i += 1 }
    }
  }

  /** EXACT whole-corpus kNN candidates, blocked: for EVERY vector, its
    * top-k neighbors within each block pair under the exact
    * (round(cos, 6) DESC, id ASC) total order `top_k_pairs` uses.
    * Downstream, `top_k_pairs` over these candidates returns the
    * bit-identical global top-k it would return over ALL pairs — a
    * global winner is a fortiori a winner inside its own block pair
    * (restriction of a total order), and the heaps here are fed the
    * ROUNDED score exactly as the aggregate is (the c06 tie lesson),
    * reproduced with Catalyst Round's HALF_UP BigDecimal semantics.
    *
    * Purpose: s10 (mutual kNN) and s12 (label agreement) need every
    * vector's exact top-k. Routing them through
    * `allPairsCosine(minCos = -1.1)` computed the same dots but
    * MATERIALIZED the full N²/2 pair relation into the shuffle — 54.7×
    * at 10× data in the round-16 sf1 sweep (≈200M rows at sf1). This
    * kernel ships k rows per (vector, block pair) instead —
    * O(N·k·nBlocks) candidate rows, quadratic FLOPs but linear shuffle —
    * the same contract as d06's threshold kernel. */
  def knnCandidatesBlocked(vecs: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      blockRows: Int = 1024): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // Catalyst Round(HALF_UP) on doubles goes through
    // BigDecimal.valueOf (shortest-string semantics) — mirrored exactly
    // so heap order matches the downstream rounded aggregate.
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    blockPairs(vecs, idCol, vecCol, blockRows).flatMap { p =>
      val same = p.bx == p.by
      val nx = p.idsX.length
      val ny = p.idsY.length
      val hx = Array.fill(nx)(new BoundedPairBuf(k))
      // same block: X and Y are the SAME rows, one buffer array serves
      // both directions (indices agree); cross block: separate buffers
      val hy = if (same) hx else Array.fill(ny)(new BoundedPairBuf(k))
      var i = 0
      while (i < nx) {
        val a0 = p.offsX(i)
        val aLen = p.offsX(i + 1) - a0
        val na = p.nrmsX(i)
        val ida = p.idsX(i)
        var j = if (same) i + 1 else 0
        while (j < ny) {
          val b0 = p.offsY(j)
          if (p.offsY(j + 1) - b0 == aLen) {
            var acc = 0.0
            var t = 0
            while (t < aLen) {
              acc = acc + p.flatX(a0 + t) * p.flatY(b0 + t); t += 1
            }
            val cosRaw = acc / (na * p.nrmsY(j))
            // rounding goes through BigDecimal (exactness contract) —
            // N² of those dominate the kernel, so only candidates that
            // can still enter a buffer pay it (floorHint is exact)
            if (cosRaw >= hx(i).floorHint || cosRaw >= hy(j).floorHint) {
              val cos6 = round6(cosRaw)
              hx(i).offer(cos6, p.idsY(j))
              hy(j).offer(cos6, ida)
            }
          }
          j += 1
        }
        i += 1
      }
      val out =
        scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      i = 0
      while (i < nx) { hx(i).emit(p.idsX(i), out); i += 1 }
      if (!same) {
        var j = 0
        while (j < ny) { hy(j).emit(p.idsY(j), out); j += 1 }
      }
      out
    }.toDF("probe", "other", "cos_sim")
  }
}
