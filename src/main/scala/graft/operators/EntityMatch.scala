package graft.operators

import graft.Checkpoints._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy entity matching (record linkage): all pairs of distinct string
  * keys within a small Levenshtein distance, found EXACTLY without an
  * all-pairs comparison — the q-gram count-filter join of Gravano et al.
  * (VLDB'01, "Approximate String Joins in a Database (Almost) for
  * Free"), re-expressed as DataFrame posting-list joins.
  *
  * Why not a cross join + `levenshtein(...) <= k` filter: the filter
  * cannot be pushed below the join, so Catalyst must materialize the
  * full O(n²) pair stream. This operator instead joins names on shared
  * character q-grams — sound because of the q-gram lower bound: a string
  * of length L has L−q+1 grams, and one edit destroys at most q of them
  * (an insertion SHIFTS later grams but preserves their values, so the
  * bound holds for gram BAGS without positions). Hence for
  * ed(a,b) ≤ k:  |grams(a) ∩ grams(b)| ≥ (max(L_a,L_b) − q + 1) − k·q,
  * which is ≥ 1 — i.e. at least one shared distinct gram is GUARANTEED —
  * whenever max(L_a, L_b) ≥ q·(k+1) + q − 1 (= 7 for q=2, k=2; in fact
  * ≥ 6 already gives bound 1 for bigrams). Pairs where BOTH sides are
  * shorter than that can share zero grams, so short names additionally
  * match within a dedicated bounded pool (length ≤ shortLen over any
  * alphabet — tiny by construction; asserted against [[maxShortPool]]
  * so the contract is loud, not silent, if an adversarial corpus floods
  * it).
  *
  * Scale shape: distinct names are catalog-scale (≪ row count — 64
  * distinct over 20k parts here, and a real 100 TB product/author/URL
  * catalog is still ≪ corpus); the joins are equi-joins on gram with
  * candidate volume Σ_g df(g)², never n². The published refinement when
  * the distinct-name set itself is huge is ED-Join's positional prefix
  * filtering (Xiao et al., VLDB'08) — index only each string's k·q+1
  * rarest grams — which drops candidate volume without losing recall;
  * the count-filter form is kept here because it is provably exact with
  * set-valued grams (the prefix lemma needs positional gram multisets).
  *
  * Row-support columns (n_a, n_b: how many source rows carry each name)
  * ride along so downstream merge/canonicalization can weight matches —
  * the record-linkage output shape, same spirit as d13's canonical pick.
  */
object EntityMatch {

  /** Names with at most this length can pair with zero shared bigrams
    * (see scaladoc bound) and go through the all-pairs short pool. */
  private val ShortLen = 5

  /** Exact (name_a, name_b, dist, n_a, n_b) pairs over the DISTINCT
    * values of `nameCol` with levenshtein ≤ maxDist, name_a < name_b.
    *
    * @param df           input relation (need not be deduplicated)
    * @param nameCol      string key to match on
    * @param maxDist      maximum Levenshtein distance (k); q = 2 grams
    * @param maxShortPool hard cap on the short-name pool: beyond this
    *                     the all-pairs pool is no longer "bounded by
    *                     construction" and the job fails loudly instead
    *                     of going quadratic
    */
  /** Distinct names with row support and length — the shared input
    * relation of [[fuzzyNamePairs]] and [[resolveEntities]] (built once
    * per call chain, never twice). */
  private def supportNames(df: DataFrame, nameCol: String): DataFrame =
    df.filter(col(nameCol).isNotNull)
      .groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("len", length(col("name")))

  def fuzzyNamePairs(df: DataFrame, nameCol: String,
      maxDist: Int = 2, maxShortPool: Long = 100000L): DataFrame =
    pairsFromNames(supportNames(df, nameCol), maxDist, maxShortPool)

  /** [[fuzzyNamePairs]] over a pre-built (name, n, len) support
    * relation. */
  private def pairsFromNames(names: DataFrame,
      maxDist: Int, maxShortPool: Long): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val q = 2

    // distinct character bigrams per name (sequence() is empty for
    // len < q, so 1-char names have no grams and only ever match via
    // the short pool — correct, they have nothing to share). expr():
    // the substring start is the lambda variable, which the Column DSL
    // substring() cannot take; still codegen'd, no UDF.
    val exploded = names.select(col("name"), col("len"),
      explode(expr(s"array_distinct(transform(" +
        s"sequence(1, greatest(len - ${q - 1}, 0)), " +
        s"i -> substring(name, i, $q)))")).as("gram"))

    // rename-projected twins, so the self-join condition never touches
    // an ambiguous shared attribute
    val gramsA = exploded.select(col("name").as("name_a"),
      col("len").as("len_a"), col("gram").as("gram_a"))
    val gramsB = exploded.select(col("name").as("name_b"),
      col("len").as("len_b"), col("gram").as("gram_b"))
    val longCandidates = gramsA.join(gramsB,
        col("gram_a") === col("gram_b") &&
          col("name_a") < col("name_b") &&
          abs(col("len_a") - col("len_b")) <= maxDist &&
          greatest(col("len_a"), col("len_b")) > ShortLen)
      .select(col("name_a"), col("name_b")).distinct()

    // short pool: both sides ≤ ShortLen — bounded all-pairs, capped loud
    val short = names.filter(col("len") <= ShortLen).select(col("name"))
    val nShort = short.count()
    require(nShort <= maxShortPool,
      s"fuzzyNamePairs: $nShort distinct names of length <= $ShortLen " +
        s"exceeds the short-pool cap $maxShortPool; the all-pairs pool " +
        "is no longer bounded — raise the cap deliberately or pre-filter")
    val shortCandidates = short.as("sa").join(short.as("sb"),
        col("sa.name") < col("sb.name"))
      .select(col("sa.name").as("name_a"), col("sb.name").as("name_b"))

    val verified = longCandidates.union(shortCandidates)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)

    val support = names.select(col("name"), col("n"))
    verified
      .join(support.select(col("name").as("name_a"), col("n").as("n_a")),
        "name_a")
      .join(support.select(col("name").as("name_b"), col("n").as("n_b")),
        "name_b")
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_a"), col("n_b"))
  }

  /** Entity resolution end-to-end: [[fuzzyNamePairs]] closed into
    * clusters ([[ConnectedComponents]] — TRANSITIVE: a~b, b~c groups
    * {a,b,c} even when ed(a,c) > maxDist, which is what a catalog merge
    * wants), each distinct name mapped to its canonical form (min name
    * in the cluster) with row support rolled up per resolved entity.
    *
    * @return (name, canonical, n_rows, cluster_size, cluster_rows) —
    *   one row per distinct name; cluster_size counts distinct names in
    *   the entity, cluster_rows sums their source-row support
    */
  def resolveEntities(df: DataFrame, nameCol: String,
      maxDist: Int = 2): DataFrame = {
    // one support aggregate feeds BOTH the pair generator and the
    // output rollup — catalog-sized, materialized once
    val support = supportNames(df, nameCol).graftCheckpoint(true)
    val names = support.select(col("name"), col("n").as("n_rows"))
    val pairs = pairsFromNames(support, maxDist, maxShortPool = 100000L)
    val labels = ConnectedComponents.run(pairs, "name_a", "name_b")
    val resolved = names
      .join(labels.withColumnRenamed("id", "name"), Seq("name"), "left")
      .select(col("name"),
        coalesce(col("label"), col("name")).as("canonical"), col("n_rows"))
    val rollup = resolved.groupBy(col("canonical"))
      .agg(count(lit(1)).as("cluster_size"),
        sum(col("n_rows")).as("cluster_rows"))
    resolved.join(rollup, "canonical")
      .select(col("name"), col("canonical"), col("n_rows"),
        col("cluster_size"), col("cluster_rows"))
  }
}
