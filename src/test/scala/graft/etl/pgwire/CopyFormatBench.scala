package graft.etl.pgwire

import java.sql.Timestamp

import graft.etl.{JdbcUpsert, Pipelines}
import org.apache.spark.sql.SparkSession

/** Manual micro-benchmark (test scope, not part of the suite): the
  * events-corpus staging write into a real PG15 through the sink, text
  * vs binary COPY — the number BASELINE.md records for the COPY BINARY
  * delta. Usage:
  *
  *   sbt "Test/runMain graft.etl.pgwire.CopyFormatBench [nFiles] [reps]"
  *
  * The pipeline output is localCheckpointed first so the timings
  * isolate the sink (staging COPY + promotion), not the CSV parse.
  */
object CopyFormatBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(120)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    require(PgServerFixture.available, "no postgres installation")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("copy-format-bench")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpusDir = "/root/reference/data/extracted"
    val paths = new java.io.File(corpusDir).listFiles()
      .map(_.getName).filter(_.endsWith(".csv")).sorted.take(nFiles)
      .map(f => s"$corpusDir/$f").toSeq
    val events = Pipelines.events(spark, paths,
      clock = Some(Timestamp.valueOf("2023-09-05 00:00:00")))
      .localCheckpoint(true)
    val rows = events.count()

    PgWireDriver.ensureRegistered()
    val server = PgServerFixture.start()
    try {
      def run(fmt: String, table: String): Double = {
        val p = server.props
        p.setProperty("pgwire.copyFormat", fmt)
        val t0 = System.nanoTime()
        JdbcUpsert.upsert(events, server.url, table, "oid__id", p)
        val sec = (System.nanoTime() - t0) / 1e9
        // drop + checkpoint so successive runs see the same cluster state
        // (accumulating heaps/WAL would bias whichever format runs later)
        val conn = java.sql.DriverManager.getConnection(server.url, p)
        try {
          val st = conn.createStatement()
          try { st.execute(s"DROP TABLE $table; CHECKPOINT") }
          finally st.close()
        } finally conn.close()
        sec
      }
      // warm both paths once (connection setup, first-table DDL),
      // then ALTERNATE formats so drift hits both equally
      run("text", "ev_warm_t"); run("binary", "ev_warm_b")
      val pairs = (1 to reps).map { i =>
        (run("text", s"ev_text_$i"), run("binary", s"ev_bin_$i"))
      }
      val text = pairs.map(_._1)
      val bin = pairs.map(_._2)
      def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
      println(f"""{"rows": $rows, "files": $nFiles, "reps": $reps, """ +
        f""""text_sec": ${med(text)}%.2f, "binary_sec": ${med(bin)}%.2f, """ +
        f""""text_all": [${text.map(x => f"$x%.2f").mkString(",")}], """ +
        f""""binary_all": [${bin.map(x => f"$x%.2f").mkString(",")}], """ +
        f""""binary_batches": ${PgJdbc.CopyBinaryBatches.get()}, """ +
        f""""copy_batches": ${PgJdbc.CopyBatches.get()}}""")

      // the type mix binary COPY exists for: timestamp/numeric-heavy rows
      // (datetime parsing + decimal scanning dominate the text path)
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val heavy = spark.range(rows / 2).select(
          $"id".as("oid__id"),
          timestamp_seconds($"id" % 100000000).as("t1"),
          timestamp_seconds(($"id" * 7) % 100000000).as("t2"),
          timestamp_seconds(($"id" * 13) % 100000000).as("t3"),
          ($"id" % 100000 / lit(100.0)).cast("decimal(18,6)").as("n1"),
          ($"id" % 77777 / lit(3.0)).cast("decimal(18,6)").as("n2"),
          ($"id" % 999 / lit(7.0)).cast("decimal(18,6)").as("n3"))
        .localCheckpoint(true)
      val prev = events
      def runH(fmt: String, table: String): Double = {
        val p = server.props
        p.setProperty("pgwire.copyFormat", fmt)
        val t0 = System.nanoTime()
        JdbcUpsert.upsert(heavy, server.url, table, "oid__id", p)
        val sec = (System.nanoTime() - t0) / 1e9
        val conn = java.sql.DriverManager.getConnection(server.url, p)
        try {
          val st = conn.createStatement()
          try { st.execute(s"DROP TABLE $table; CHECKPOINT") }
          finally st.close()
        } finally conn.close()
        sec
      }
      runH("text", "hv_warm_t"); runH("binary", "hv_warm_b")
      val hPairs = (1 to reps).map { i =>
        (runH("text", s"hv_text_$i"), runH("binary", s"hv_bin_$i"))
      }
      println(f"""{"heavy_rows": ${rows / 2}, """ +
        f""""heavy_text_sec": ${med(hPairs.map(_._1))}%.2f, """ +
        f""""heavy_binary_sec": ${med(hPairs.map(_._2))}%.2f, """ +
        f""""heavy_text_all": [${hPairs.map(x => f"${x._1}%.2f").mkString(",")}], """ +
        f""""heavy_binary_all": [${hPairs.map(x => f"${x._2}%.2f").mkString(",")}]}""")
      val _ = prev
    } finally {
      PgServerFixture.stop(server)
      spark.stop()
    }
  }
}
