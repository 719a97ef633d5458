package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Storage-pruning proof for the persisted IVF inverted file: written
  * PARTITIONED BY (cell), a probe of nProbe cells must plan partition
  * PRUNING (`PartitionFilters` on the scan — directories never read),
  * not a full scan with a post-filter, and searching the pruned index
  * must return exactly what the in-memory index returns.
  */
class IvfStorageSpec extends SparkSpec {
  import spark.implicits._

  test("inverted file partitioned by cell prunes probe reads and preserves results") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val vectors = emb.select($"vec_id", Similarity.toDouble($"embedding").as("v"))
    val centroids = Ivf.kmeans(vectors, nCells = 8, iterations = 2)
    val indexed = Ivf.index(emb, centroids)
    Ivf.writeIndex(indexed, dir)

    // directory layout is one subdir per cell
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell=")).sorted
    assert(subdirs.nonEmpty, s"expected cell= partition dirs, got ${subdirs.toSeq}")

    val onDisk = Ivf.readIndex(spark, dir)
    val probedCells = Seq(subdirs.head, subdirs.last)
      .map(_.stripPrefix("cell=").toInt)
    val pruned = onDisk.filter($"cell".isin(probedCells: _*))
    val plan = pruned.queryExecution.executedPlan.toString
    // the cell predicate must be a PartitionFilter on the scan, and must
    // NOT degrade to a data Filter over a full read
    assert("PartitionFilters: \\[.*cell".r.findFirstIn(plan).isDefined,
      s"cell filter must prune partitions:\n${plan.take(2500)}")
    assert(!plan.contains("PushedFilters: [In(cell"),
      "cell is a partition column; it must never reach the row-group filter")

    // correctness: the pruned read is exactly the matching index slice
    val expected = indexed.filter($"cell".isin(probedCells: _*))
      .select($"vec_id").collect().map(_.getLong(0)).sorted
    val got = pruned.select($"vec_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(expected))

    // and KNN over the persisted index matches KNN over the in-memory one
    val probes = emb.filter($"vec_id" < 2)
    val diskKnn = Ivf.knn(onDisk, centroids, probes, k = 5, nProbe = 3)
    val fromDisk = diskKnn
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fromMem = Ivf.knn(indexed, centroids, probes, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromDisk === fromMem)

    // the probe join key must stay the partition column's own type — a
    // widened key would PROJECT cast(cell as bigint) on the index side
    // of the join and defeat partition-level pruning. (The tiny
    // centroid-side cast inside the top-k aggregate's input is benign.)
    val knnPlan = diskKnn.queryExecution.executedPlan.toString
    assert("cast\\(cell#\\d+ as bigint\\) AS".r.findFirstIn(knnPlan).isEmpty,
      s"probe join must not re-key the partition column:\n${knnPlan.take(2500)}")
  }
}
