package graft

import org.apache.spark.sql.SparkSession

/** Human-facing demo entry point: load the reference corpus through the
  * full ETL, run the reference's three analytical queries over the loaded
  * tables, and show a taste of the extended surface.
  *
  *   sbt "runMain graft.Demo"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("== graft: Spark-native engine demo ==")
    val t0 = System.nanoTime()
    val tracking = operators.EtlQueries.replay(spark, "tracking")
    val events = operators.EtlQueries.replay(spark, "events")
    println(f"corpus loaded: ${tracking.count()}%,d tracking docs, " +
      f"${events.count()}%,d event rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    println("\n-- Q1: trackings per minute (first 5) --")
    operators.ReferenceQueries.q1(spark).show(5, truncate = false)
    println("-- Q2: events per tracking code (top 5) --")
    operators.ReferenceQueries.q2(spark).show(5, truncate = false)
    println("-- Q3: top-10 descriptions --")
    operators.ReferenceQueries.q3(spark).show(10, truncate = false)

    println("-- extended surface: py_to_json + top_k from SQL --")
    spark.sql(
      """SELECT `description`, total_events FROM (
        |  SELECT `description`, COUNT(*) AS total_events FROM events
        |  GROUP BY `description`) ORDER BY total_events DESC LIMIT 3"""
        .stripMargin).show(truncate = false)

    spark.stop()
  }
}
