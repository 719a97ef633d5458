package graft.etl.pgwire

import java.sql.Timestamp

import graft.etl.Pipelines
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Manual probe (test scope): COPY throughput into ONE Postgres table
  * as a function of WRITER CONCURRENCY. PG15 extends heap relations
  * one page at a time under the relation extension lock (bulk extend
  * landed in PG16), so N concurrent COPY writers into a single table
  * serialize on extension once the table outgrows the page cache —
  * this probe measures where the knee is, to size
  * JdbcUpsert.MaxStagingConnections on evidence instead of folklore.
  *
  * Usage: sbt "Test/runMain graft.etl.pgwire.CopyConcurrencyProbe <corpusDir> [k1,k2,...]"
  */
object CopyConcurrencyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/etl_corpus_10x")
    val ks = args.drop(1).headOption.getOrElse("4,8,16,32")
      .split(",").map(_.trim.toInt).toSeq
    require(PgServerFixture.available, "no postgres installation")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val paths = {
      val fs = new java.io.File(dir).listFiles()
      fs.map(_.getName).filter(_.endsWith(".csv")).sorted
        .map(f => s"$dir/$f").toSeq
    }
    val ev = Pipelines.events(spark, paths,
      clock = Some(Timestamp.valueOf("2023-09-05 00:00:00")))
      .localCheckpoint(true)
    val rows = ev.count()
    PgWireDriver.ensureRegistered()
    val server = PgServerFixture.start()
    try {
      val out = ks.map { k =>
        val t0 = System.nanoTime()
        ev.coalesce(k).write.mode(SaveMode.Overwrite)
          .jdbc(server.url, s"ev_conc_$k", server.props)
        val sec = (System.nanoTime() - t0) / 1e9
        val c = java.sql.DriverManager.getConnection(server.url, server.props)
        try {
          val st = c.createStatement()
          try st.execute(s"DROP TABLE ev_conc_$k; CHECKPOINT")
          finally st.close()
        } finally c.close()
        f""""k$k": $sec%.1f"""
      }
      println(s"""{"rows": $rows, ${out.mkString(", ")}}""")
    } finally PgServerFixture.stop(server)
    spark.stop()
  }
}
