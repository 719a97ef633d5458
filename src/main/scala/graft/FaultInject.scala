package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fault-injection proof (the recovery leg of the multi-JVM story):
  * `kill -9` one executor JVM MID-JOB under `local-cluster[2,C,MB]` and
  * assert the job completes with BIT-IDENTICAL output vs. an unkilled
  * run. This exercises the machinery a 1000-executor fleet leans on
  * daily — task retry on the surviving executor, FetchFailed-driven
  * parent-stage resubmission for the lost shuffle files, standalone
  * worker executor relaunch — none of which `local[*]` can even
  * represent (there is no executor process to lose).
  *
  * Modes:
  *   batch <query> [killAfterMs]  — run a registered SparkEntry query
  *     twice in fresh sessions (baseline, then with one executor killed
  *     `killAfterMs` after the action starts); compare sorted row
  *     strings (Double.toString is injective, the NaN-safe compare
  *     convention).
  *   stream [killAfterMs] — the exact-pairs ingest scenario from
  *     StreamingSpec (3 doc batches through exactPairsIngest) with one
  *     executor killed during the drain; asserts the cumulative
  *     committed pair feed equals the whole-corpus batch d16 join —
  *     the oracle-shape equality, now across a mid-ingest process loss.
  *
  * Usage (the local-cluster recipe from SCALE.md):
  *   sbt package && export SPARK_SCALA_VERSION=2.13
  *   SPARK_GRAFT_JARS=target/scala-2.13/<app>.jar \
  *   sbt -batch "runMain graft.FaultInject /root/testdata/sf0.1 batch g02_pagerank"
  *
  * Exit code 0 iff outputs match (and, in the kill leg, an executor was
  * actually killed — a too-late kill degrades to a vacuous pass, so it
  * FAILS instead).
  */
object FaultInject {
  private def session(): SparkSession = {
    val master =
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,8,4096]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    ClusterEnv.withExecutorEnv(builder, sys.env.get("SPARK_GRAFT_JARS"),
      sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "3g")).getOrCreate()
  }

  /** PIDs of live executor JVMs (separate processes under
    * local-cluster; empty under local[*]). */
  private def executorPids(): Seq[ProcessHandle] = {
    import scala.jdk.CollectionConverters._
    ProcessHandle.allProcesses().iterator().asScala
      .filter(_.info().commandLine().map[Boolean](
        _.contains("CoarseGrainedExecutorBackend")).orElse(false))
      .toSeq
  }

  /** Kill one executor after `delayMs`; returns whether one died. */
  private def killOneAfter(delayMs: Long): java.util.concurrent.Future[Boolean] = {
    val ex = java.util.concurrent.Executors.newSingleThreadExecutor()
    val f = ex.submit(new java.util.concurrent.Callable[Boolean] {
      def call(): Boolean = {
        Thread.sleep(delayMs)
        val es = executorPids()
        es.headOption.exists { p =>
          val pid = p.pid()
          val ok = p.destroyForcibly()
          System.err.println(s"[fault] kill -9 executor pid=$pid -> $ok")
          ok
        }
      }
    })
    ex.shutdown()
    f
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1)
    val killAfterMs = args.lift(3).orElse(args.lift(2).filter(_.forall(_.isDigit)))
      .map(_.toLong).getOrElse(2500L)

    val ok = mode match {
      case "batch" =>
        val query = args(2)
        val fn = SparkEntry.queries(query)
        // baseline: fresh session, no interference
        val s1 = session()
        val want = rows(fn(s1, sfDir))
        s1.stop()
        // kill leg: fresh session (fresh executors), kill one mid-job
        val s2 = session()
        val killed = killOneAfter(killAfterMs)
        val got = rows(fn(s2, sfDir))
        s2.stop()
        val k = killed.get()
        if (!k) System.err.println(
          "[fault] FAIL: no executor was killed (job finished too fast? " +
            "raise killAfterMs granularity or use a bigger SF)")
        if (got != want) System.err.println(
          s"[fault] FAIL: ${got.diff(want).size} rows differ from baseline")
        println(s"""{"mode":"batch","query":"$query","killed":$k,""" +
          s""""rows":${want.size},"match":${got == want}}""")
        k && got == want

      case "stream" =>
        val spark = session()
        import spark.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        val tmp = java.nio.file.Files.createTempDirectory("fault_stream").toString
        val docs = Tables.documents(spark, sfDir)
          .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
        val input = MemoryStream[(Long, String)]
        val cuts = Seq(0, docs.length / 3, 2 * docs.length / 3, docs.length)
        (0 until 3).foreach(r => input.addData(docs.slice(cuts(r), cuts(r + 1)).toSeq))
        val killed = killOneAfter(killAfterMs)
        val q = streaming.Streaming.exactPairsIngest(
          input.toDF().toDF("doc_id", "text"), "doc_id", "text",
          s"$tmp/out", s"$tmp/index", s"$tmp/commits", s"$tmp/ckpt",
          minJaccard = 0.7)
        q.awaitTermination()
        val got = streaming.Streaming.readPairs(spark, s"$tmp/out", s"$tmp/commits")
          .select($"doc_a", $"doc_b", $"n_common", $"size_a", $"size_b", $"jaccard")
        val want = operators.Dedup.prefixFilterJaccardPairs(
          Tables.documents(spark, sfDir), "doc_id", "text",
          n = 3, minJaccard = 0.7)
        val (g, w) = (rows(got), rows(want))
        val k = killed.get()
        spark.stop()
        if (!k) System.err.println("[fault] FAIL: no executor was killed")
        if (g != w) System.err.println(
          s"[fault] FAIL: pair feed differs from batch d16 (${g.size} vs ${w.size})")
        println(s"""{"mode":"stream","killed":$k,"pairs":${w.size},""" +
          s""""match":${g == w}}""")
        k && g == w

      case other => System.err.println(s"unknown mode: $other"); false
    }
    if (!ok) sys.exit(1)
  }
}
