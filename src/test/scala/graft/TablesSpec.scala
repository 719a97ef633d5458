package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Guards the testdata loader against driver testdata-generation drift.
  *
  * The driver has shipped the events `ts` column as TIMESTAMP(NANOS)
  * (arrives as LongType under nanosAsLong), as TIMESTAMP(MICROS,
  * adjusted-to-UTC), and as TIMESTAMP(MICROS, NTZ) across rounds. Round 5
  * lost six window/as-of queries to the NTZ variant — Spark 4 refuses
  * CAST(TIMESTAMP_NTZ AS BIGINT), so every epoch-arithmetic query threw at
  * analysis. Tables.load must always hand queries a session-tz
  * TimestampType `ts`, whatever the parquet encoding.
  */
class TablesSpec extends SparkSpec {

  test("events.ts is session-tz TimestampType and epoch-castable") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val dt = ev.schema("ts").dataType
    assert(dt == TimestampType, s"ts must be TimestampType (LTZ), got $dt")
    // The exact expression that broke in round 5 must analyze and run.
    val r = ev.select(min(col("ts").cast("long")).as("lo"),
                      max(col("ts").cast("long")).as("hi"))
      .head()
    assert(r.getLong(0) > 0L && r.getLong(1) >= r.getLong(0))
  }

  test("widenDense is layout-aware: dense directory layout widens, star " +
    "table and kill-switch never do (r13 ask 5)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables-widen").toString
    // a ~8 MB single-part parquet DIRECTORY — the layout the old
    // single-file File.length probe silently skipped (it saw a
    // directory, stat'd it as not-a-file, and never widened). Tokens
    // are hash-unique so parquet can't compress below the widen floor;
    // one row group, so the scan stays narrower than local[4]'s
    // parallelism (the d12 single-row-group shape).
    val docs = (0 until 2000)
      .map { i =>
        val text = (0 until 250)
          .map(j => java.lang.Long.toHexString(
            (i * 1000L + j) * 0x9e3779b97f4a7c15L))
          .mkString(" ")
        (i.toLong, text, "src")
      }
      .toDF("doc_id", "text", "source")
      .repartition(1)
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    docs.toDF("l_orderkey", "l_comment", "l_shipmode")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val scan = spark.read.parquet(s"$dir/documents.parquet")
    assume(scan.rdd.getNumPartitions <
      spark.sparkContext.defaultParallelism,
      "fixture must scan narrower than parallelism for widen to matter")
    // dense table, big enough, narrow scan -> widened to parallelism
    assert(Tables.documents(spark, dir).rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // star table: same bytes, same layout — never widened (its
    // consumers shuffle right after a cheap scan)
    assert(Tables.lineitem(spark, dir).rdd.getNumPartitions ===
      scan.rdd.getNumPartitions)
    // kill-switch pins the A/B claim per deployment
    spark.conf.set("graft.wideScans", "false")
    try assert(Tables.documents(spark, dir).rdd.getNumPartitions ===
      scan.rdd.getNumPartitions)
    finally spark.conf.unset("graft.wideScans")
    // small dense table (the committed sf dirs) stays on the narrow
    // path — the oracle exercises it unchanged
    val small = Tables.documents(spark, sf("sf0.001"))
    assert(small.rdd.getNumPartitions <=
      spark.sparkContext.defaultParallelism)
  }

  test("NTZ parquet round-trips to the same UTC wall-time values") {
    // Write an NTZ-typed parquet and confirm the loader normalizes it to
    // the identical instants an LTZ read would see under the UTC session.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables-ntz").toString
    val src = Seq(1L, 1700000000L, 1700003600L).toDF("secs")
      .withColumn("ts", timestamp_seconds(col("secs")).cast(TimestampNTZType))
      .withColumn("event_id", col("secs"))
      .select("event_id", "ts")
    src.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val back = Tables.events(spark, dir)
    assert(back.schema("ts").dataType == TimestampType)
    val got = back.select(col("ts").cast("long")).as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 1700000000L, 1700003600L))
  }
}
