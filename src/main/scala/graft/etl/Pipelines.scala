package graft.etl

import java.sql.Timestamp
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The two reference DAGs (dags/postgres_etl/{tracking,events}_table.py)
  * as lazy DataFrame pipelines. Each produces ONE plan per batch:
  * scan → parse → explode → convert → project → normalize → dedup,
  * executed only by the sink write (or by the caller for tests/queries).
  *
  * Incremental contract (SURVEY.md §2.9): the watermark is max(fileName)
  * in the target table; only files strictly greater are read. Combined
  * with the idempotent delete+insert sink this gives crash-safe,
  * effectively-exactly-once loading at batch granularity — the same
  * contract the reference implements by hand.
  */
object Pipelines {

  /** tracking: one row per CDC document (no explode).
    * scan → epoch→ts → uploadDate → project → normalizeNulls →
    * dedupKeepLast → distinct. */
  def tracking(spark: SparkSession, csvPaths: Seq[String],
      watermark: Option[String] = None,
      clock: Option[Timestamp] = None,
      intendedDedup: Boolean = true): DataFrame = {
    val raw = spark.read.schema(Schemas.source)
      .option("header", "true").csv(csvPaths: _*)
    val tagged = Transforms.afterWatermark(watermark)(
      Transforms.addFileName(raw)).drop("array_trackingEvents")
    val converted = Transforms.withUploadDate(clock)(
      Transforms.epochSecondsToTs(tagged))
    val projected = Transforms.normalizeNulls(
      Transforms.project(Schemas.trackingColumns)(converted))
    // keep-last already leaves one row per key — the trailing distinct is
    // only needed (and only can remove anything) on the non-dedup path
    if (intendedDedup) Transforms.dedupKeepLast(projected)
    else Transforms.distinctRows(projected)
  }

  /** events: one row per nested tracking event (explode_outer).
    * scan → parse(py→json→array) → explode → flatten → uploadDate →
    * project → normalizeNulls → distinct. */
  def events(spark: SparkSession, csvPaths: Seq[String],
      watermark: Option[String] = None,
      clock: Option[Timestamp] = None): DataFrame = {
    val raw = spark.read.schema(Schemas.source)
      .option("header", "true").csv(csvPaths: _*)
    val tagged = Transforms.afterWatermark(watermark)(Transforms.addFileName(raw))
    val exploded = Transforms.explodeEvents(Transforms.parseEventArray(tagged))
    val converted = Transforms.withUploadDate(clock)(exploded)
    val projected = Transforms.normalizeNulls(
      Transforms.project(Schemas.eventsColumns)(converted))
    Transforms.distinctRows(projected)
  }

  /** Full incremental load step: probe watermark, build pipeline, upsert.
    * One call = one reference "DAG run". */
  def loadIncremental(spark: SparkSession, csvPaths: Seq[String], url: String,
      table: String, pipeline: String, props: Properties = new Properties(),
      clock: Option[Timestamp] = None): Long = {
    val wm = JdbcUpsert.lastUploadedFile(spark, url, table, props = props)
    val df = pipeline match {
      case "tracking" => tracking(spark, csvPaths, wm, clock)
      case "events"   => events(spark, csvPaths, wm, clock)
      case other      => throw new IllegalArgumentException(s"unknown pipeline: $other")
    }
    val cached = df.cache()
    try {
      val n = cached.count()
      if (n > 0) JdbcUpsert.upsert(cached, url, table, "oid__id", props)
      n
    } finally { cached.unpersist(); () }
  }
}
