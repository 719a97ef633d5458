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

  test("compactPartition: one bucket dir rewritten to one file, probe results identical") {
    val dir = java.nio.file.Files.createTempDirectory("band_compact").toString
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    // three appends simulate three streaming ingests → multi-file buckets
    (0 to 2).foreach { r =>
      Dedup.bandIndexRows(docs.filter($"doc_id" % 3 === r),
          "doc_id", "text")
        .write.mode("append").partitionBy("bucket_p").parquet(dir)
    }
    val buckets = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bucket_p="))
    def files(b: String) = new java.io.File(s"$dir/$b").listFiles()
      .filter(_.getName.endsWith(".parquet")).length
    val fat = buckets.filter(files(_) > 1)
    assert(fat.nonEmpty, "appends must leave multi-file buckets to compact")
    val target = fat.head
    val batch = docs.filter($"doc_id" % 7 === 0)
    def probe() = Dedup.probeBandIndex(
        graft.sources.ParquetSink.read(spark, dir), batch, "doc_id", "text")
      .select($"doc_new", $"doc_old").as[(Long, Long)].collect().toSet
    val before = probe()
    val beforeRows = spark.read.parquet(dir).count()
    val compacted = graft.sources.ParquetSink
      .compactPartition(spark, dir, target)
    assert(compacted > 0L)
    assert(files(target) === 1, "compacted bucket must hold one file")
    assert(spark.read.parquet(dir).count() === beforeRows,
      "compaction must not change index contents")
    assert(probe() === before,
      "probe results must be identical after compaction")
  }

  test("compactHotPartitions: sweep compacts every fat bucket, content and probe preserved") {
    val dir = java.nio.file.Files.createTempDirectory("band_sweep").toString
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    (0 to 3).foreach { r =>
      Dedup.bandIndexRows(docs.filter($"doc_id" % 4 === r),
          "doc_id", "text")
        .write.mode("append").partitionBy("bucket_p").parquet(dir)
    }
    def buckets = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bucket_p="))
    def files(b: String) = new java.io.File(s"$dir/$b").listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(buckets.exists(files(_) > 2),
      "appends must leave >2-file buckets for the sweep to find")
    val batch = docs.filter($"doc_id" % 7 === 0)
    def probe() = Dedup.probeBandIndex(
        graft.sources.ParquetSink.read(spark, dir), batch, "doc_id", "text")
      .select($"doc_new", $"doc_old").as[(Long, Long)].collect().toSet
    val (beforeProbe, beforeRows) = (probe(), spark.read.parquet(dir).count())
    val swept = graft.sources.ParquetSink
      .compactHotPartitions(spark, dir, maxFiles = 2)
    assert(swept.nonEmpty, "sweep must compact the fat buckets")
    assert(buckets.forall(files(_) <= 2),
      "after the sweep no bucket may exceed maxFiles")
    assert(spark.read.parquet(dir).count() === beforeRows)
    assert(probe() === beforeProbe)
    // idempotent: a second sweep finds nothing above the threshold
    assert(graft.sources.ParquetSink
      .compactHotPartitions(spark, dir, maxFiles = 2).isEmpty)
  }

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
