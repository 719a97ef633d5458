package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Storage-pruning + equivalence proof for the persisted MinHash band
  * index: probing it with a new batch must (a) lay out one directory per
  * bucket prefix, (b) plan DYNAMIC partition pruning from the broadcast
  * probe side, and (c) return exactly the cross-boundary pairs the
  * in-memory LSH path finds on the union corpus.
  */
class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  test("band index: bucket_p layout, dynamic pruning, probe ≡ in-memory cross pairs") {
    val dir = java.nio.file.Files.createTempDirectory("band_index").toString
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val old = docs.filter($"doc_id" % 7 =!= 0) // d11's corpus/batch split
    val batch = docs.filter($"doc_id" % 7 === 0)

    Dedup.writeBandIndex(old, "doc_id", "text", dir)
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bucket_p=")).sorted
    assert(subdirs.nonEmpty, s"expected bucket_p= partition dirs, got ${subdirs.toSeq}")

    val index = graft.sources.ParquetSink.read(spark, dir)
    val probed = Dedup.probeBandIndex(index, batch, "doc_id", "text")

    // the broadcast probe join on the partition column must plan dynamic
    // partition pruning — unmatched bucket_p directories are never read
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"probe must dynamically prune the partitioned index:\n" +
        plan.linesIterator.filter(_.contains("PartitionFilters"))
          .mkString("\n").take(2000))

    // equivalence: exactly the cross-boundary subset of the in-memory
    // LSH pairs over the union corpus (huge cap: no star degradation on
    // either side, so the candidate sets must match pair-for-pair)
    val batchIds = batch.select($"doc_id").as[Long].collect().toSet
    val mem = Dedup.minHashLshPairs(docs, "doc_id", "text",
        maxBucket = 1000000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => batchIds.contains(a) ^ batchIds.contains(b) }
      .map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }
      .toSet
    val fromIndex = probed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .map { case (o, n, j) => (math.min(o, n), math.max(o, n), j) }
      .toSet
    assert(fromIndex === mem,
      s"index probe must equal the in-memory cross pairs " +
        s"(${fromIndex.size} vs ${mem.size})")
    assert(fromIndex.nonEmpty,
      "the synthetic corpus plants near-dups across the batch boundary")
  }
}
