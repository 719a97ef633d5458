package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The blocked all-pairs cosine kernel must be ROW-IDENTICAL to the
  * row-join form it replaced as d06's engine: same pair set, same
  * rounded cos_sim doubles, under any block size, including the
  * degenerate-vector contract (null / zero-norm / truncated vectors
  * never pair). */
class SimilarityBlockedSpec extends SparkSpec {
  import spark.implicits._

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select($"vec_a", $"vec_b", $"cos_sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("blocked kernel == row-join form on real embeddings (value-exact)") {
    for (d <- Seq("sf0.001", "sf0.01")) {
      val emb = graft.Tables.embeddings(spark, sf(d))
      val naive = asSet(DataOps.exactCosinePairs(emb))
      val blocked = asSet(Similarity.allPairsCosine(emb, minCos = 0.45))
      assert(blocked === naive, s"$d: blocked vs row-join pair sets differ")
      assert(naive.nonEmpty, s"$d: empty truth — vacuous test")
    }
  }

  test("block-size invariance: any blockRows gives the identical result") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val ref = asSet(Similarity.allPairsCosine(emb, minCos = 0.45))
    for (b <- Seq(3, 17, 100000)) {
      assert(asSet(Similarity.allPairsCosine(emb, 0.45, blockRows = b)) === ref,
        s"blockRows=$b diverged")
    }
  }

  test("knn candidate kernel: global top-k over candidates equals top-k " +
    "over ALL pairs, any block size") {
    import graft.functions.TopKPairs.top_k_pairs
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    def topk(cands: org.apache.spark.sql.DataFrame) = cands
      .groupBy($"probe")
      .agg(top_k_pairs($"cos_sim", $"other", 5).as("__nn"))
      .select($"probe", posexplode($"__nn").as(Seq("__pos", "__p")))
      .select($"probe", $"__p.id".as("other"), $"__p.score".as("cos"),
        $"__pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    // truth: the full N²/2 pair relation (the pre-round-16 s10 feed)
    val all = Similarity.allPairsCosine(emb, minCos = -1.1)
    val want = topk(all
      .select($"vec_a".as("probe"), $"vec_b".as("other"), $"cos_sim")
      .unionByName(all.select($"vec_b".as("probe"), $"vec_a".as("other"),
        $"cos_sim")))
    assert(want.nonEmpty)
    // the candidate kernel must reproduce it bit-for-bit — ranks, ties
    // and rounded scores included — under any blocking
    for (b <- Seq(7, 64, 1024, 100000)) {
      val got = topk(Similarity.knnCandidatesBlocked(emb, k = 5,
        blockRows = b))
      assert(got === want, s"blockRows=$b: kNN top-5 diverged")
    }
  }

  test("degenerate vectors: null, zero-norm, truncated never pair") {
    // ids 1/2 are exact clones (cos 1.0); 3 is a zero vector; 4 is
    // truncated (length mismatch vs everyone); 5 is null; 6 is the
    // negation of 1 (cos -1, below threshold)
    val rows = Seq(
      (1L, Some(Seq(1.0f, 2.0f, 3.0f, 4.0f))),
      (2L, Some(Seq(1.0f, 2.0f, 3.0f, 4.0f))),
      (3L, Some(Seq(0.0f, 0.0f, 0.0f, 0.0f))),
      (4L, Some(Seq(1.0f, 2.0f, 3.0f))),
      (5L, None),
      (6L, Some(Seq(-1.0f, -2.0f, -3.0f, -4.0f))))
      .toDF("vec_id", "embedding")
    val got = asSet(Similarity.allPairsCosine(rows, minCos = 0.45,
      blockRows = 2))
    assert(got === Set((1L, 2L, 1.0)))
    // The row-join twin agrees wherever it is defined: under ANSI mode
    // its division THROWS on a zero-norm vector (DIVIDE_BY_ZERO), which
    // is why the blocked kernel drops nrm == 0 rows explicitly — a
    // deliberate hardening, compared here on the frame minus the zero
    // vector.
    assert(asSet(DataOps.exactCosinePairs(rows.filter($"vec_id" =!= 3L)))
      === got)
  }
}
