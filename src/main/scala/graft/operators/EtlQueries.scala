package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.Pipelines

/** The reference ETL pipelines as driver-visible queries: a full replay of
  * the 881-file CDC corpus (tracking = per-document, events = per-nested-
  * event with the Python-literal parse + explode_outer). Fully oracled
  * since round 14: [[trackingReplaySql]]/[[eventsReplaySql]] rebuild the
  * reference semantics in DuckDB SQL from the raw corpus (the general
  * Python-literal grammar is not SQL-expressible, but THIS corpus's
  * measured value space makes an exact rewrite possible — see the oracle
  * section), so the driver hash-matches all 3M replay rows cross-engine;
  * the ScalaTest suite (graft.etl.*Spec) still gates the general-input
  * semantics (escapes, malformed literals, quarantine) the corpus
  * doesn't exercise.
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

  // ------------------------------------------------------------------
  // INDEPENDENT DuckDB-side replay oracles (round-14 ask 4): the replay
  // rows used to be gated only by self-referential specs + value
  // goldens; these rebuild the reference semantics (dags/datahelper/
  // postgres.py:117-155) from the raw CSV corpus in DuckDB SQL, so the
  // driver's compare now hash-matches the FULL corpus output of both
  // pipelines against an engine that shares no code with the Spark
  // side. The rewrite is justified by measured corpus properties
  // (tools-probed, round 14): all 881 files are valid UTF-8, no field
  // contains a double quote or an embedded newline, the only
  // backslash escape in any Python literal is \t (also a valid JSON
  // escape), no string value contains the token 'None' — so the
  // literal→JSON transform is two plain replaces (' → ", None → null),
  // exact on this corpus by construction (the engine's PyLiteralParser
  // handles the general cases; QuarantineSpec gates those on synthetic
  // input). explode_outer's keep-empty-row semantics are reproduced by
  // padding empty/null arrays with [NULL] before unnest (DuckDB's
  // unnest drops empties).
  // ------------------------------------------------------------------

  /** The six-column typed scan shared by both replay oracles; basename
    * via regexp — the fileName audit column (S2). */
  private def rawScanSql: String =
    s"""raw AS (
       |  SELECT "Op", oid__id, "createdAt", "updatedAt",
       |    "lastSyncTracker", array_trackingEvents,
       |    regexp_extract(filename, '([^/]+)$$', 1) AS fileName
       |  FROM read_csv('$CorpusDir/*.csv',
       |    header = true, filename = true,
       |    columns = {'Op': 'VARCHAR', 'oid__id': 'VARCHAR',
       |      'createdAt': 'BIGINT', 'updatedAt': 'BIGINT',
       |      'lastSyncTracker': 'BIGINT',
       |      'array_trackingEvents': 'VARCHAR'}))""".stripMargin

  /** F5's literal-string null map, applied per string column. */
  private def nullMap(c: String, as: String): String =
    s"""CASE WHEN $c IN ('NaN', 'NaT', 'None', '') THEN NULL
       |      ELSE $c END AS $as""".stripMargin

  /** tracking pipeline: epoch→ts, fixed uploadDate clock, null map,
    * keep-last dedup — the ORDER BY mirrors Transforms.dedupKeepLast
    * exactly (fileName, then the version columns, then the remaining
    * columns in projection order, all DESC NULLS LAST). */
  private[operators] def trackingReplaySql: String =
    s"""WITH $rawScanSql,
       |conv AS (
       |  SELECT
       |    ${nullMap("oid__id", "oid__id")},
       |    ${nullMap("\"Op\"", "\"Op\"")},
       |    make_timestamp("createdAt" * 1000000) AS "createdAt",
       |    make_timestamp("updatedAt" * 1000000) AS "updatedAt",
       |    make_timestamp("lastSyncTracker" * 1000000)
       |      AS "lastSyncTracker",
       |    TIMESTAMP '2023-09-05 00:00:00' AS uploadDate,
       |    ${nullMap("fileName", "fileName")}
       |  FROM raw),
       |d AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY oid__id
       |    ORDER BY fileName DESC NULLS LAST,
       |      "updatedAt" DESC NULLS LAST,
       |      "lastSyncTracker" DESC NULLS LAST,
       |      "Op" DESC NULLS LAST, "createdAt" DESC NULLS LAST,
       |      uploadDate DESC NULLS LAST) AS __rn
       |  FROM conv)
       |SELECT oid__id, "Op", "createdAt", "updatedAt",
       |  "lastSyncTracker", uploadDate, fileName
       |FROM d WHERE __rn = 1""".stripMargin

  /** events pipeline: literal→JSON→typed array, explode_outer (with the
    * [NULL] pad), Mongo $$date flatten, null map, full-row distinct. */
  private[operators] def eventsReplaySql: String = {
    val eventStruct =
      """STRUCT("createdAt" STRUCT("$date" BIGINT),
        |        "trackingCode" VARCHAR, "status" VARCHAR,
        |        "description" VARCHAR, "trackerType" VARCHAR,
        |        "from" VARCHAR, "to" VARCHAR)""".stripMargin
    s"""WITH $rawScanSql,
       |parsed AS (
       |  SELECT oid__id, fileName,
       |    CASE WHEN array_trackingEvents IS NULL THEN NULL
       |      ELSE json_transform(
       |        replace(replace(array_trackingEvents, chr(39), '"'),
       |          'None', 'null'),
       |        '[{"createdAt": {"$$date": "BIGINT"},
       |           "trackingCode": "VARCHAR", "status": "VARCHAR",
       |           "description": "VARCHAR", "trackerType": "VARCHAR",
       |           "from": "VARCHAR", "to": "VARCHAR"}]')
       |    END AS arr
       |  FROM raw),
       |padded AS (
       |  SELECT oid__id, fileName,
       |    CASE WHEN arr IS NULL OR len(arr) = 0
       |      THEN [NULL :: $eventStruct]
       |      ELSE arr END AS arr
       |  FROM parsed),
       |ex AS (SELECT oid__id, fileName, unnest(arr) AS e FROM padded),
       |flat AS (
       |  SELECT
       |    ${nullMap("oid__id", "oid__id")},
       |    ${nullMap("e.\"trackingCode\"", "trackingCode")},
       |    ${nullMap("e.\"status\"", "status")},
       |    ${nullMap("e.\"description\"", "description")},
       |    ${nullMap("e.\"trackerType\"", "trackerType")},
       |    ${nullMap("e.\"from\"", "\"from\"")},
       |    ${nullMap("e.\"to\"", "\"to\"")},
       |    make_timestamp(e."createdAt"."$$date" * 1000)
       |      AS eventCreatedAt,
       |    TIMESTAMP '2023-09-05 00:00:00' AS uploadDate,
       |    ${nullMap("fileName", "fileName")}
       |  FROM ex)
       |SELECT DISTINCT * FROM flat""".stripMargin
  }

  /** Fenced (the corpus scan is the one oracle input that is hundreds
    * of MB — see DataOps.fenced); the staged variant rides the same
    * oracle, its rows are the same relation through a parquet hop. */
  val oracleSql: Map[String, String] = Map(
    "etl_tracking_replay" -> DataOps.fenced(trackingReplaySql),
    "etl_events_replay" -> DataOps.fenced(eventsReplaySql),
    "etl_events_replay_staged" -> DataOps.fenced(eventsReplaySql)
  )
}
