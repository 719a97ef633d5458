package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual stage decomposition for d12_substringDupPairs (test scope,
  * not part of the suite): times the index build, the candidate
  * generation (with and without the h2 pre-filter), and the span
  * verify separately, so cost-reduction work attacks the measured
  * bottleneck instead of the assumed one.
  *
  * Usage: sbt "Test/runMain graft.operators.D12Probe /tmp/graft_sf2"
  */
object D12Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.Checkpoints.CheckpointOps
    import graft.functions.RollingWindowHashes.window_hashes2

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    val docs = graft.Tables.documents(spark, d)
    val window = 50
    val cap = 1000L

    // page-cache warm (the Bench protocol) so stage 1 measures the
    // index build, not the first cold read of the corpus parquet
    time("0. warm corpus read") { docs.count() }

    import graft.functions.RollingWindowHashes.window_hashes2_dedup
    val idx = time("1a. map-only dedup index + checkpoint") {
      docs.select($"doc_id".as("doc"),
          window_hashes2_dedup($"text", window).as(Seq("pos", "h", "h2")))
        .graftCheckpoint(true)
    }
    println(s"   idx rows: ${idx.count()}")
    time("1b. OLD explode+groupBy index + checkpoint") {
      docs.select($"doc_id".as("doc"),
          window_hashes2($"text", window).as(Seq("pos", "h", "h2")))
        .groupBy($"doc", $"h").agg(min(struct($"pos", $"h2")).as("__m"))
        .select($"doc", $"h", $"__m.pos".as("pos"), $"__m.h2".as("h2"))
        .graftCheckpoint(true).count()
    }

    val pairsAll = time("2. bucketPairs (no h2 filter), count") {
      val p = Dedup.bucketPairsForProbe(idx, Seq("h"),
        struct($"doc", $"pos", $"h2"), cap)
      val n = p.count()
      println(s"   candidates: $n")
      p
    }
    time("3. h2 filter survivor count") {
      println("   survivors: " +
        pairsAll.filter($"a.h2" === $"b.h2").count())
    }
    val full = time("4. full operator (end-to-end, fresh lineage)") {
      Dedup.substringDupPairs(docs, "doc_id", "text", window, cap).count()
    }
    println(s"   verified pairs: $full")
    spark.stop()
  }
}
