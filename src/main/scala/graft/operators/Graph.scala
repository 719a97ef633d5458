package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph computation on DataFrames (no GraphX dependency —
  * plain joins + aggregations, so Catalyst/AQE plan every step).
  *
  * pageRank: fixed-iteration power method. Each round is one join of the
  * rank vector against the out-degree-normalized edge list + one
  * aggregation — both shuffle on the vertex key, so co-partitioning is
  * reused across rounds. Lineage is truncated per round (localCheckpoint)
  * exactly as in [[ConnectedComponents]]. Fixed iteration count keeps the
  * result deterministic (a convergence-threshold loop would couple the
  * result to fp accumulation order).
  */
object Graph {

  /** @param edges directed (src, dst) pairs
    * @return (id, rank) for every vertex appearing in `edges`
    */
  def pageRank(edges: DataFrame, iterations: Int = 10,
      damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(true)
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val nV = vertices.count().toDouble
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val norm = e.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
      .localCheckpoint(true)

    // dangling (sink) vertices: their rank mass must be redistributed
    // uniformly each round or it leaks and ranks no longer sum to 1.
    // Flagged ONCE as a column so the per-round mass is an aggregate
    // over the rank vector itself — no per-round semi-join.
    val flagged = vertices
      .join(e.select(col("src").as("id")).distinct()
        .withColumn("__has_out", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("__has_out"), lit(false))
        .as("has_out"))
      .localCheckpoint(true)

    var ranks = flagged.withColumn("rank", lit(1.0 / nV))
    for (_ <- 1 to iterations) {
      // dangling mass rides along as a BROADCAST 1-row aggregate instead
      // of a driver-side action: one job per round (the checkpoint), not
      // two. Decimal-exact, so order-independent (engine convention).
      val danglingMass = ranks
        .agg(coalesce(sum(when(!col("has_out"),
            col("rank").cast("decimal(38,28)"))), lit(0))
          .cast("double").as("__dm"))
      val contrib = norm
        .join(ranks.select(col("id").as("src"), col("rank")), "src")
        .groupBy(col("dst").as("id"))
        // decimal-exact contribution sum: a double sum's value depends on
        // partition/reduction order, which would make ranks wobble in the
        // last ulps across executor counts (engine convention, README)
        .agg(sum((col("rank") * col("w")).cast("decimal(38,28)"))
          .cast("double").as("in_rank"))
      ranks = flagged
        .join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(danglingMass))
        .select(col("id"), col("has_out"),
          (lit((1.0 - damping) / nV) +
            lit(damping) * (coalesce(col("in_rank"), lit(0.0)) +
              col("__dm") / lit(nV))).as("rank"))
        .localCheckpoint(true)
    }
    ranks.select(col("id"), col("rank"))
  }

  /** Minimum hop distance from a seed set — frontier (delta-iteration)
    * BFS. Unlike [[ConnectedComponents]]' label propagation, each round
    * touches only the CURRENT frontier: one equi-join of the frontier
    * against the edge list plus one anti-join against the visited set,
    * both shuffling on the vertex key so the co-partitioning is reused
    * round to round. Per-round shuffle volume is O(frontier adjacency),
    * not O(V+E) — on a 100 TB graph the expensive rounds are the middle
    * ones where the frontier peaks, and nothing ever materializes more
    * than the reached set. Depths are integers assigned by round number,
    * so the result is exactly deterministic under any partitioning (no
    * fp accumulation anywhere) and exactly checkable against a
    * recursive-CTE oracle. Early-exits when the frontier drains.
    *
    * @param edges directed (src, dst); symmetrize before calling for
    *              undirected reachability
    * @param seeds one column `id` — depth-0 vertices
    * @return (id, depth) for every vertex reachable within maxDepth
    */
  def bfsDepth(edges: DataFrame, seeds: DataFrame,
      maxDepth: Int, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("e_src"), col(dstCol).as("e_dst"))
      .localCheckpoint(true)
    var visited = seeds.select(col("id")).distinct()
      .withColumn("depth", lit(0)).localCheckpoint(true)
    var frontier = visited.select(col("id"))
    var d = 0
    var drained = false
    while (d < maxDepth && !drained) {
      d += 1
      val next = frontier
        .join(e, col("id") === col("e_src"))
        .select(col("e_dst").as("id")).distinct()
        .join(visited.select(col("id")), Seq("id"), "left_anti")
        .withColumn("depth", lit(d))
        .localCheckpoint(true) // truncate lineage: plan must not grow per round
      if (next.limit(1).isEmpty) drained = true
      else {
        visited = visited.union(next).localCheckpoint(true)
        frontier = next.select(col("id"))
      }
    }
    visited
  }

  /** The customer–supplier trade graph: undirected bipartite edges
    * between customers and the suppliers they have ever ordered from
    * (distinct (o_custkey, l_suppkey) via orders ⋈ lineitem). Vertex ids
    * are disambiguated arithmetically — customer k ↦ 2k, supplier k ↦
    * 2k+1 — so both partitions live in one integer keyspace and every
    * join below stays a plain long equi-join. */
  private def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val cs = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .distinct()
    cs.select((col("c") * 2).as("src"), (col("sp") * 2 + 1).as("dst"))
      .union(cs.select((col("sp") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Iterative graph traversal: hop distance from the nation-0 customer
    // cohort over the trade graph — the "crawl depth from seed domains"
    // shape of a web-corpus pipeline. Integer-exact, so fully oracled
    // against DuckDB's recursive CTE. Delta-iteration: each round joins
    // only the frontier against the edge list (see bfsDepth scaladoc).
    "g01_bfs_depth" -> { (s, d) =>
      val seeds = Tables.customer(s, d)
        .filter(col("c_nationkey") === 0)
        .select((col("c_custkey") * 2).as("id"))
      Graph.bfsDepth(tradeEdges(s, d), seeds, maxDepth = 4)
        .select(
          when(col("id") % 2 === 0, lit("customer"))
            .otherwise(lit("supplier")).as("kind"),
          expr("id div 2").as("key"),
          col("depth"))
    },

    // Fixed-iteration PageRank over the directed customer→supplier trade
    // graph (suppliers are all dangling, so the sink-mass redistribution
    // path is exercised on every round). Deterministic by construction —
    // contribution sums are decimal-exact (see pageRank scaladoc) — but
    // iterative fp has no SQL oracle, so this is spec-gated (GraphSpec:
    // hand-computed fixpoint, sink-mass conservation, partitioning
    // invariance) and the driver records rows-only. Ranks are rounded to
    // 10 dp for a stable dump; sum(rank) ≈ 1 is part of the spec gate.
    "g02_pagerank" -> { (s, d) =>
      val cs = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
        .distinct()
      val directed = cs.select((col("c") * 2).as("src"),
        (col("sp") * 2 + 1).as("dst"))
      Graph.pageRank(directed, iterations = 10)
        .select(
          when(col("id") % 2 === 0, lit("customer"))
            .otherwise(lit("supplier")).as("kind"),
          expr("id div 2").as("key"),
          round(col("rank"), 10).as("rank"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    // UNION (not UNION ALL) recursion: the working set is the newly
    // discovered distinct (id, depth) pairs, so the recursion is bounded
    // by (maxDepth+1)·|V| rows even on this dense bipartite graph; the
    // final GROUP BY MIN collapses multi-depth sightings to first reach.
    "g01_bfs_depth" ->
      """WITH RECURSIVE
        |cs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT c*2 AS src, sp*2+1 AS dst FROM cs
        |  UNION ALL SELECT sp*2+1, c*2 FROM cs),
        |bfs(id, depth) AS (
        |  SELECT c_custkey*2, 0 FROM customer WHERE c_nationkey = 0
        |  UNION
        |  SELECT e.dst, b.depth + 1 FROM bfs b JOIN e ON e.src = b.id
        |  WHERE b.depth < 4),
        |m AS (SELECT id, MIN(depth) AS depth FROM bfs GROUP BY id)
        |SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
        |    AS kind,
        |  id // 2 AS key, depth
        |FROM m""".stripMargin
  )
}
