package graft.operators

import graft.SparkSpec
import graft.Checkpoints

/** The `graft.checkpoint` strategy contract: `local` (default) and
  * `reliable` produce BIT-IDENTICAL results on the iterative operators —
  * only the lineage-truncation substrate differs (executor blocks vs the
  * reliable checkpoint store). The reliable path is what survives executor
  * preemption on a real cluster; this spec proves switching to it is free
  * of value drift, and that misconfiguration fails loudly instead of
  * silently running unprotected.
  */
class CheckpointStrategySpec extends SparkSpec {

  private def withStrategy[A](mode: String)(body: => A): A = {
    spark.conf.set("graft.checkpoint", mode)
    try body finally spark.conf.set("graft.checkpoint", "local")
  }

  // doubles compared as strings: Some(NaN) == Some(NaN) is false under
  // BoxesRunTime, and string render makes "bit-identical" literal
  private def rendered(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // FIRST: later tests set a sticky context-level checkpoint dir, and
  // this one needs the truly-unset state
  test("reliable without a checkpoint dir fails loudly") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    spark.conf.set("graft.checkpoint", "reliable")
    try {
      val e = intercept[IllegalStateException] {
        Graph.pageRank(edges, iterations = 1).collect()
      }
      assert(e.getMessage.contains("graft.checkpoint=reliable"))
    } finally spark.conf.set("graft.checkpoint", "local")
  }

  test("pageRank is bit-identical under local and reliable checkpointing") {
    import spark.implicits._
    val edges = (Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L)) ++
      (5L until 40L).map(i => (i, (i * 7) % 40))).toDF("src", "dst")
    val local = rendered(Graph.pageRank(edges, iterations = 10))
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_pr")
    val reliable = withStrategy(s"reliable:$dir") {
      rendered(Graph.pageRank(edges, iterations = 10))
    }
    assert(local == reliable)
    // the reliable run actually wrote round checkpoints to the store
    val walk = java.nio.file.Files.walk(dir)
    val wrote = try walk.count() > 1 finally walk.close()
    assert(wrote, s"no checkpoint data under $dir")
  }

  test("kCore is identical under local and reliable checkpointing") {
    import spark.implicits._
    // K4 plus a tail: the K4 survives 3-core peeling, the tail peels away
    val edges = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))).toDF("src", "dst")
    val local = rendered(Graph.kCore(edges, k = 3))
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_kc")
    val reliable = withStrategy(s"reliable:$dir") {
      rendered(Graph.kCore(edges, k = 3))
    }
    assert(local == reliable)
    assert(local.nonEmpty)
  }

  test("connected-components clustering is identical under both strategies") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("doc_a", "doc_b")
    val local = rendered(ConnectedComponents.dedupClusters(docs, "doc_id", pairs))
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_cc")
    val reliable = withStrategy(s"reliable:$dir") {
      rendered(ConnectedComponents.dedupClusters(docs, "doc_id", pairs))
    }
    assert(local == reliable)
  }

  test("an unknown strategy fails loudly") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    spark.conf.set("graft.checkpoint", "ram")
    try {
      val e = intercept[IllegalArgumentException] {
        Graph.pageRank(edges, iterations = 1).collect()
      }
      assert(e.getMessage.contains("expected local | reliable"))
    } finally spark.conf.set("graft.checkpoint", "local")
  }

  test("strategy parsing keeps reliable paths case-sensitive") {
    spark.conf.set("graft.checkpoint", "Reliable:/Tmp/MixedCase")
    try assert(Checkpoints.strategy(spark) == "reliable:/Tmp/MixedCase")
    finally spark.conf.set("graft.checkpoint", "local")
  }
}
