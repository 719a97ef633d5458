package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual stage decomposition for d10_semantic_pairs (test scope, not
  * part of the suite): times the √N k-means train and the cell-join
  * pair stage separately, under whatever master SPARK_GRAFT_MASTER
  * selects — the cluster-lane serde tail (VERDICT r13 ask 7) needs the
  * slow STAGE, not the slow query.
  *
  * Usage: sbt "Test/runMain graft.operators.D10Probe /tmp/graft_sf1"
  *   (+ SPARK_GRAFT_MASTER/SPARK_GRAFT_JARS for the cluster lane)
  */
object D10Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = graft.ClusterEnv.withExecutorEnv(builder,
      sys.env.get("SPARK_GRAFT_JARS"),
      sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "3g")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    val emb = graft.Tables.embeddings(spark, d)
    time("0. warm corpus read") { emb.count() }
    val vectors = emb.select($"vec_id",
      Similarity.toDouble($"embedding").as("v"))
    val n = vectors.count()
    val nCells = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    val centroids = time(s"1. kmeans train ($nCells cells, 3 iters)") {
      val c = Ivf.kmeans(vectors, nCells = nCells, iterations = 3)
      c.count(); c
    }
    time("2. pair stage (assign + cell join + threshold)") {
      Dedup.semanticDupPairs(vectors, centroids,
        minCosSim = 0.45, nProbe = 3).count()
    }
    time("3. full d10 body (memoized path, fresh memo)") {
      graft.SparkEntry.queries("d10_semantic_pairs")(spark, d).count()
    }
    spark.stop()
  }
}
