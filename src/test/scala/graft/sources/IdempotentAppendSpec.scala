package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retry-idempotency proof for [[ParquetSink.idempotentBatchAppend]] —
  * the write primitive behind the commit-marker ingests whose index and
  * shard rows must never duplicate (exactPairsIngest, trainingSetIngest).
  *
  * The failure it guards: foreachBatch is at-least-once and the commit
  * marker lands LAST, so a retry between a completed mode(append) write
  * and the marker re-appends the batch's rows under the SAME batch_id;
  * once the retry's marker exists, the committed-filter exposes both
  * copies — duplicated inventory rows double n_common and corrupt every
  * later jaccard. The primitive's contract: any number of re-runs of the
  * same (df, batchId) leave exactly one copy, without touching other
  * batches' rows, and the layout stays a plain partitioned parquet dir
  * that partition discovery, pruning, and compaction all understand. */
class IdempotentAppendSpec extends SparkSpec {
  import spark.implicits._

  private def mkBatch(batchId: Long, ids: Seq[Long]) =
    ids.toDF("doc").withColumn("batch_id", lit(batchId))
      .withColumn("bucket_p", pmod(xxhash64($"doc"), lit(4L)))

  test("retrying a torn batch leaves exactly one copy; other batches untouched") {
    val dir = java.nio.file.Files.createTempDirectory("idem_append").toString
    // batch 0 commits normally
    ParquetSink.idempotentBatchAppend(mkBatch(0L, 0L to 19L), dir,
      "bucket_p", 0L)
    // batch 1: attempt 1 completes the write but (simulated) crashes
    // before the marker; attempts 2 and 3 are checkpoint replays of the
    // same uncommitted batch id
    val b1 = mkBatch(1L, 20L to 29L)
    ParquetSink.idempotentBatchAppend(b1, dir, "bucket_p", 1L)
    ParquetSink.idempotentBatchAppend(b1, dir, "bucket_p", 1L)
    ParquetSink.idempotentBatchAppend(b1, dir, "bucket_p", 1L)
    val rows = spark.read.parquet(dir)
      .select($"doc", $"batch_id").as[(Long, Long)].collect().toSeq
    assert(rows.distinct.sorted === rows.sorted,
      "a retried batch must not duplicate its rows")
    assert(rows.sorted ===
      ((0L to 19L).map((_, 0L)) ++ (20L to 29L).map((_, 1L))).sorted,
      "the layout must hold exactly one copy of each batch's rows")
    // no staging debris survives
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".staged_")),
      "staging dirs must be cleaned up")
  }

  test("partition discovery, pruning filters, and compaction all still work") {
    val dir = java.nio.file.Files.createTempDirectory("idem_layout").toString
    (0L to 5L).foreach { b =>
      ParquetSink.idempotentBatchAppend(
        mkBatch(b, (b * 10) to (b * 10 + 9)), dir, "bucket_p", b)
    }
    // re-run the last batch (torn-retry) before committing it
    ParquetSink.idempotentBatchAppend(
      mkBatch(5L, 50L to 59L), dir, "bucket_p", 5L)
    val df = spark.read.parquet(dir)
    assert(df.columns.sorted === Array("batch_id", "bucket_p", "doc"),
      "bucket_p must come back as a partition column")
    assert(df.count() === 60L)
    // committed-filter semantics unchanged: batch_id is a data column
    assert(df.filter($"batch_id".isin(0L, 2L)).count() === 20L)
    // compaction (which renames files, erasing the batch prefix) is safe
    // because it only ever runs AFTER a batch's commit — verify content
    // survives a sweep, as the ingests rely on
    val before = df.select($"doc", $"batch_id").as[(Long, Long)]
      .collect().toSet
    ParquetSink.compactHotPartitions(spark, dir, maxFiles = 1)
    val after = spark.read.parquet(dir)
      .select($"doc", $"batch_id").as[(Long, Long)].collect().toSet
    assert(after === before, "compaction must preserve the appended rows")
  }

  test("underscore-prefixed partition columns (__dp) are swept, not skipped") {
    // trainingSetIngest's digest index partitions by __dp — Spark keeps
    // `_x=v` dirs in listings (the contains-'=' exemption) and so must
    // the debris sweep, or a torn digest append would silently duplicate
    val dir = java.nio.file.Files.createTempDirectory("idem_dp").toString
    def batch = (0L to 9L).toDF("doc")
      .withColumn("batch_id", lit(0L))
      .withColumn("__dp", pmod(xxhash64($"doc"), lit(4L)))
    ParquetSink.idempotentBatchAppend(batch, dir, "__dp", 0L)
    ParquetSink.idempotentBatchAppend(batch, dir, "__dp", 0L)
    assert(spark.read.parquet(dir).count() === 10L,
      "retry under __dp partitioning must not duplicate")
  }
}
