package graft.operators

import graft.Checkpoints._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation
  * with pointer jumping — the clustering step that turns near-duplicate
  * PAIRS into duplicate GROUPS (a dedup pipeline keeps one canonical
  * document per component).
  *
  * Each iteration every vertex adopts the minimum label among itself and
  * its neighbors (one-hop propagation), then additionally adopts its
  * LABEL's label (pointer jumping — the label graph is a valid
  * same-component relation, so chasing it is sound and halves chain
  * depth). One-hop alone needs O(diameter) rounds and chained
  * near-duplicates can form long paths; with jumping, convergence is
  * O(log diameter) — 20 rounds covers any component a real corpus can
  * produce. If the loop still exits unconverged the labels are WRONG
  * (split components → multiple "keepers" per duplicate cluster), so run()
  * throws instead of returning them. [[graft.Checkpoints]] truncates the
  * lineage every round — without it the plan doubles per iteration and
  * the job dies on plan explosion long before it dies on data size.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (src, dst), undirected semantics
    * @return (id, label) — label = min vertex id in the component
    * @throws IllegalStateException if labels have not stabilized after
    *   maxIter rounds (returning them silently would split components)
    */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .union(edges.select(col(dstCol).as("s"), col(srcCol).as("d")))
      .distinct()
      .graftCheckpoint(true)
    var labels = sym.select(col("s").as("id")).distinct()
      .withColumn("label", col("id"))
      .graftCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "d_id"), col("d") === col("d_id"))
        .groupBy(col("s")).agg(min(col("label")).as("nmin"))
      val prop = labels
        .join(neighborMin, col("id") === col("s"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (col("label") =!= least(col("label"),
            coalesce(col("nmin"), col("label")))).as("changed"))
        .graftCheckpoint(true) // materialize BEFORE the self-join below
      // pointer jumping: label := label(label). Reads the checkpoint
      // twice rather than recomputing the propagation plan per side.
      val next = prop.as("x")
        .join(prop.select(col("id").as("y_id"), col("label").as("y_label")),
          col("x.label") === col("y_id"), "left")
        .select(col("x.id").as("id"),
          least(col("x.label"), coalesce(col("y_label"), col("x.label")))
            .as("label"),
          (col("x.changed") || col("x.label") =!=
            least(col("x.label"), coalesce(col("y_label"), col("x.label"))))
            .as("changed"))
        .graftCheckpoint(true)
      converged = next.filter(col("changed")).limit(1).isEmpty
      labels = next.drop("changed")
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds; " +
          "labels would split components (duplicate keepers) — raise maxIter")
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
