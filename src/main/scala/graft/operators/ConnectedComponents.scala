package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the clustering step that turns near-duplicate PAIRS into duplicate
  * GROUPS (a dedup pipeline keeps one canonical document per component).
  *
  * Each iteration every vertex adopts the minimum label among itself and
  * its neighbors; convergence when no label changes. For near-dup graphs
  * components are small and dense, so convergence is a handful of rounds
  * regardless of corpus size; each round is one join + one aggregation on
  * the edge list. `localCheckpoint` truncates the lineage every round —
  * without it the plan doubles per iteration and the job dies on plan
  * explosion long before it dies on data size.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (src, dst), undirected semantics
    * @return (id, label) — label = min vertex id in the component
    */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .union(edges.select(col(dstCol).as("s"), col(srcCol).as("d")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("s").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "d_id"), col("d") === col("d_id"))
        .groupBy(col("s")).agg(min(col("label")).as("nmin"))
      val next = labels
        .join(neighborMin, col("id") === col("s"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (col("label") =!= least(col("label"),
            coalesce(col("nmin"), col("label")))).as("changed"))
        .localCheckpoint(true)
      converged = next.filter(col("changed")).limit(1).isEmpty
      labels = next.drop("changed")
      iter += 1
    }
    labels
  }

  /** Full dedup clustering: every document gets a cluster id (= min
    * doc_id of its near-dup component; singletons cluster to themselves)
    * and a keeper flag. */
  def dedupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val labels = run(pairs, aCol, bCol)
    docs.select(col(idCol))
      .join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("label"), col(idCol)).as("cluster"),
        (coalesce(col("label"), col(idCol)) === col(idCol)).as("keeper"))
  }
}
