package graft.etl

import org.apache.spark.sql.types._

/** Schemas for the CDC CSV corpus and the two target tables
  * (SURVEY.md §1.2-1.3; reference: dags/postgres_etl/events_table.py:19-41,
  * tracking_table.py:19-31, README.md:85-108).
  *
  * Schemas are explicit — never `inferSchema`: the `status` field carries
  * leading zeros ('01') that inference would destroy, and a schema-inference
  * pass over 100 TB of CSV is a full extra read of the corpus.
  */
object Schemas {

  /** Known corpus property: a minority of files carry Latin-1 bytes in
    * the free-text description fields (not valid UTF-8). Spark's CSV
    * reader replaces them with U+FFFD rather than failing; a strict
    * decoder (or pandas' default) would crash on those files. If exact
    * byte fidelity matters, read with .option("encoding","ISO-8859-1")
    * per-file after sniffing — mixed-encoding corpora cannot be decoded
    * correctly with any single setting. */

  /** The uniform 6-column source schema of every CDC dump file. */
  val source: StructType = StructType(Seq(
    StructField("Op", StringType),
    StructField("oid__id", StringType),
    StructField("createdAt", LongType),     // epoch seconds
    StructField("updatedAt", LongType),     // epoch seconds
    StructField("lastSyncTracker", LongType), // epoch seconds
    StructField("array_trackingEvents", StringType)))

  /** Nested event element: Mongo extended-JSON `{'$date': millis}` plus
    * six string fields ('from'/'to' are SQL reserved words — always
    * backtick-quote in Spark, double-quote in generated DDL/DML). */
  val eventElement: StructType = StructType(Seq(
    StructField("createdAt",
      StructType(Seq(StructField("$date", LongType)))),
    StructField("trackingCode", StringType),
    StructField("status", StringType),
    StructField("description", StringType),
    StructField("trackerType", StringType),
    StructField("from", StringType),
    StructField("to", StringType)))

  val eventArray: ArrayType = ArrayType(eventElement)

  /** Target `tracking` table: one row per CDC document. */
  val trackingColumns: Seq[String] = Seq(
    "oid__id", "Op", "createdAt", "updatedAt", "lastSyncTracker")

  /** Target `events` table: one row per nested tracking event. */
  val eventsColumns: Seq[String] = Seq(
    "oid__id", "trackingCode", "status", "description", "trackerType",
    "from", "to", "eventCreatedAt")

  /** Columns appended by the pipeline to every target row. */
  val auditColumns: Seq[String] = Seq("uploadDate", "fileName")

  /** Epoch-seconds columns converted to timestamps in both pipelines. */
  val epochSecondCols: Seq[String] = Seq("createdAt", "updatedAt", "lastSyncTracker")

  /** The exact header every source file must carry. */
  val expectedHeader: String = source.fields.map(_.name).mkString(",")

  /** Schema-drift guard: returns (path, actualHeader) for every file
    * whose header deviates from the contract. Run BEFORE ingesting a
    * batch — a silently-drifted upstream schema is the classic way a CDC
    * pipeline loads garbage for weeks. Header reads are control-plane
    * metadata (one line per file, driver-side by design); at very large
    * file counts run it over the file LIST in parallel instead. */
  def validateHeaders(paths: Seq[String]): Seq[(String, String)] =
    paths.flatMap { p =>
      val src = scala.io.Source.fromFile(p, "ISO-8859-1")
      try {
        val header = src.getLines().nextOption().getOrElse("")
        if (header != expectedHeader) Some(p -> header) else None
      } finally src.close()
    }
}
