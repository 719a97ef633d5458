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
