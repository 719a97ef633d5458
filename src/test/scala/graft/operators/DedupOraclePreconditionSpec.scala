package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guards the RUNTIME preconditions behind the "EXACTLY oracled" claims
  * of d03 (MinHash-LSH) and d04 (SimHash): the DuckDB oracle re-derives
  * candidate pairs from band-slice / chunk-value EQUALITY, which equals
  * the engine's output only while
  *
  *   (a) star degradation never fires — every band/chunk bucket stays
  *       below the default cap (1000), and
  *   (b) the engine's grouping-only xxhash64 band buckets are
  *       collision-free (two DISTINCT slice strings in one bucket would
  *       make the engine emit a candidate the oracle never generates).
  *
  * Both were only ever MEASURED at the test SFs (max band bucket 4,
  * max chunk bucket 291 at sf0.1) — this spec pins them at all three
  * SFs so a future SF bump fails with "cap binds at sfX" instead of an
  * opaque oracle hash-mismatch. d04 needs only (a): its buckets are the
  * raw 16-bit chunk values, no grouping hash at all. */
class DedupOraclePreconditionSpec extends SparkSpec {
  import spark.implicits._

  private val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
  private val Cap = 1000L // minHashLshPairs/simHashPairs default maxBucket

  test("d03 precondition: no MinHash band bucket reaches the star cap, " +
    "and band buckets are xxhash64-collision-free") {
    sfs.foreach { s =>
      // the exact d03 parameterization (shingleN=3, numPerm=16, bands=4)
      val banded = Dedup.bandedSignatures(
        graft.Tables.documents(spark, sf(s)), "doc_id", "text",
        shingleN = 3, numPerm = 16, bands = 4)
      // the slice string the bucket hash was computed FROM (band r=4):
      // a bucket holding two distinct slices is a hash collision the
      // oracle cannot see
      val r = 16 / 4
      val sliced = banded.withColumn("slice",
        concat_ws(",", slice($"sig", $"band" * r + lit(1), lit(r))))
      val worst = sliced.groupBy($"band", $"bucket")
        .agg(count(lit(1)).as("n"),
          countDistinct($"slice").as("n_slices"))
        .agg(max($"n").as("max_bucket"), max($"n_slices").as("max_slices"))
        .as[(Long, Long)].head()
      assert(worst._1 < Cap,
        s"d03 cap binds at $s: max band bucket ${worst._1} >= $Cap — " +
          "star degradation fires and the exact oracle no longer matches")
      assert(worst._2 === 1L,
        s"d03 xxhash64 band-bucket collision at $s — the engine would " +
          "emit a candidate the oracle never generates")
    }
  }

  test("d04 precondition: no SimHash pigeonhole chunk bucket reaches the star cap") {
    sfs.foreach { s =>
      // the exact d04 parameterization: maxDist=3 → 4 chunks of 16 bits
      // (the signaturePairs chunking expression, re-derived verbatim)
      val chunks = 4
      val width = 64 / chunks
      val mask = (1L << width) - 1
      val fp = Dedup.simHash(
        graft.Tables.documents(spark, sf(s)), "doc_id", "text")
      val banded = fp.select($"doc",
        posexplode(array((0 until chunks).map(i =>
          shiftrightunsigned($"simhash", i * width)
            .bitwiseAND(mask)): _*)).as(Seq("chunk", "val")))
      val worst = banded.groupBy($"chunk", $"val")
        .agg(count(lit(1)).as("n"))
        .agg(max($"n")).as[Long].head()
      assert(worst < Cap,
        s"d04 cap binds at $s: max chunk bucket $worst >= $Cap — " +
          "star degradation fires and the exact oracle no longer matches")
    }
  }

  test("d10 precondition: no probe cell reaches semanticDupPairs' " +
    "cellCap — the exact oracle assumes star mode never fires") {
    // d10's exact parameterization: kmeans(max(16, ceil(sqrt(N))), 3
    // rounds), nProbe=3, cellCap=100000. The oracle generates pairs by
    // a plain within-cell self-join; above the cap the engine degrades
    // the cell to a star around its min-payload representative and the
    // two diverge. Cell occupancy counts PROBE rows (each vector lands
    // in 3 cells).
    val CellCap = 100000L
    sfs.foreach { s =>
      import graft.functions.TopKPairs.top_k_pairs
      val vectors = graft.Tables.embeddings(spark, sf(s))
        .select($"vec_id", Similarity.toDouble($"embedding").as("v"))
      val nCells = math.max(16, math.ceil(
        math.sqrt(vectors.count().toDouble)).toInt)
      val centroids = Ivf.kmeans(vectors, nCells = nCells, iterations = 3)
      val worst = vectors.crossJoin(broadcast(centroids))
        .withColumn("__d", graft.functions.VectorExprs
          .sq_dist_double($"v", $"centroid"))
        .groupBy($"vec_id")
        .agg(top_k_pairs(-$"__d", $"cell", 3).as("__cells"))
        .select(explode($"__cells.id").as("cell"))
        .groupBy($"cell").agg(count(lit(1)).as("n"))
        .agg(max($"n")).as[Long].head()
      assert(worst < CellCap,
        s"d10 cap binds at $s: max probe cell $worst >= $CellCap — " +
          "star degradation fires and the exact oracle no longer matches")
    }
  }

  test("d10/e06 precondition: the embedding column is null-free — the " +
    "oracle's COUNT(*) mean divisor counts rows the engine's mean skips") {
    sfs.foreach { s =>
      val nulls = graft.Tables.embeddings(spark, sf(s))
        .filter($"embedding".isNull).count()
      assert(nulls === 0L,
        s"$s ships $nulls null embeddings: the k-means-replaying " +
          "oracles (d10Sql/e06Sql) assume a null-free corpus — add the " +
          "engine's null semantics to the SQL before bumping the fixture")
    }
  }
}
