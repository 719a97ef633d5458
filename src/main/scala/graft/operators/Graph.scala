package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    // uniformly each round or it leaks and ranks no longer sum to 1
    val sinks = vertices
      .join(e.select(col("src").as("id")).distinct(), Seq("id"), "left_anti")
      .localCheckpoint(true)

    var ranks = vertices.withColumn("rank", lit(1.0 / nV))
    for (_ <- 1 to iterations) {
      // one scalar per round (decimal-exact, so order-independent)
      val danglingMass = ranks.join(sinks, Seq("id"), "left_semi")
        .agg(coalesce(sum(col("rank").cast("decimal(38,28)")), lit(0))
          .cast("double"))
        .head().getDouble(0)
      val contrib = norm
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        // decimal-exact contribution sum: a double sum's value depends on
        // partition/reduction order, which would make ranks wobble in the
        // last ulps across executor counts (engine convention, README)
        .agg(sum((col("rank") * col("w")).cast("decimal(38,28)"))
          .cast("double").as("in_rank"))
      ranks = vertices
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / nV) +
            lit(damping) * (coalesce(col("in_rank"), lit(0.0)) +
              lit(danglingMass / nV))).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
