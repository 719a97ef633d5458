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
