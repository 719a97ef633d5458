package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. `/root/testdata/sf0.01`) so the same
  * code runs at any scale factor. At cluster scale the same loaders would
  * point at a partitioned table root; parquet scans get column pruning and
  * predicate pushdown from Catalyst automatically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // Normalize the events `ts` column across driver testdata generations:
    //  - TIMESTAMP(NANOS) parquet arrives as nanos-since-epoch LongType when
    //    spark.sql.legacy.parquet.nanosAsLong=true (set by our builders);
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ,
    //    which Spark 4 refuses to cast to numeric (breaks epoch arithmetic).
    // Both become session-tz TimestampType; with the UTC session timezone our
    // builders pin, the NTZ->LTZ cast is value-identical to the wall time
    // DuckDB's oracle sees when it reads the same naive-timestamp parquet.
    normalizeTs(df)
  }

  /** Normalize a `ts` column to session-tz TimestampType whatever the
    * parquet encoding delivered (see [[load]]); shared with the streaming
    * readers, whose source schema is the raw parquet schema. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
