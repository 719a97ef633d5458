package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths once so the first measured query doesn't
    // absorb all of classloading + JIT.
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // Optional comma-separated query filter for local iteration; the
    // driver never sets it, so the full surface is benched per round.
    // Unknown names fail fast — a typo must not yield an empty "success".
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(names.nonEmpty && unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY: empty or unknown queries: ${unknown.mkString(", ")}")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        // a failing query must be VISIBLE in the output (-1), never a
        // plausible elapsed time
        name -> (try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case _: Throwable => -1.0 })
      }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // -1.0 marks a failed query; keep it visible per-query but exclude it
    // from the total (a failure must not SUBTRACT from the headline) and
    // surface an explicit failure count instead.
    val ok = results.values.filter(_ >= 0)
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val failed = results.count(_._2 < 0)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Stdout gets tail-truncated by the driver (both BENCH_r02/r03 carry
    // "parsed": null); persist the full per-query map as a file artifact
    // so round-over-round diffs read from the file, not the tail.
    val outName = "bench_" + new java.io.File(sfDir).getName + ".json"
    try {
      val w = new java.io.PrintWriter(new java.io.File(outName), "UTF-8")
      try w.println(line) finally w.close()
    } catch { case _: Throwable => () } // best-effort: never fail the bench
    spark.stop()
  }
}
