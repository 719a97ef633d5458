package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Probabilistic sketch operators — the sublinear-memory path for corpus
  * statistics at 100 TB, where exact distinct/frequency tables do not fit
  * anywhere.
  *
  * These wrap Spark's mergeable sketch implementations (each executor
  * sketches its partitions, the driver merges k small sketches): memory is
  * O(sketch size), never O(distinct values). Deterministic given fixed
  * seeds. Error characteristics are part of the contract and are asserted
  * by the test suite:
  *   - CountMinSketch: overestimates only, ε·N additive error at
  *     confidence δ
  *   - BloomFilter: no false negatives, bounded false-positive rate
  *   - approx quantiles: rank error ≤ ε·N (Greenwald-Khanna)
  */
object Sketches {

  /** Count-min sketch over a column; query any value's estimated count. */
  def countMin(df: DataFrame, colName: String,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(colName, eps, confidence, seed)

  /** Estimated frequencies of the given candidate values. */
  def estimateCounts(df: DataFrame, colName: String, candidates: Seq[Any],
      eps: Double = 0.001, confidence: Double = 0.99): Seq[(Any, Long)] = {
    val cms = countMin(df, colName, eps, confidence)
    candidates.map(v => v -> cms.estimateCount(v))
  }

  /** Bloom filter over a column — the distributed membership test used to
    * pre-filter a big join probe side (ship the filter, not the table). */
  def bloom(df: DataFrame, colName: String, expectedItems: Long,
      fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(colName, expectedItems, fpp)

  /** Filter `df` to rows whose `colName` might be in `keys` (per a Bloom
    * filter built on `keys`) — semi-join pre-filter with no shuffle of
    * `df`; false positives pass through (a later exact join removes
    * them), false negatives cannot occur. The probe is typed from the
    * column's actual data type — a fixed Long-typed probe would make
    * Spark cast string keys to bigint (→ NULL → every row dropped). */
  def bloomPreFilter(df: DataFrame, colName: String, keys: DataFrame,
      keyCol: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    def family(dt: DataType): String = dt match {
      case StringType => "string"
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case other => throw new IllegalArgumentException(
        s"bloomPreFilter: unsupported key type $other " +
          "(Spark's bloom filter hashes integral and string keys only)")
    }
    // probe and filter MUST hash the same way — a long-built filter
    // probed with string hashing (or vice versa) yields silent false
    // negatives, the one failure mode this operator promises not to have
    val fam = family(df.schema(colName).dataType)
    require(fam == family(keys.schema(keyCol).dataType),
      s"bloomPreFilter: probe column $colName (${df.schema(colName).dataType}) " +
        s"and key column $keyCol (${keys.schema(keyCol).dataType}) must hash " +
        "in the same family")
    val bf = bloom(keys, keyCol, expectedItems, fpp)
    val bcast = df.sparkSession.sparkContext.broadcast(bf)
    // codegen'd native probe (graft.functions.BloomMightContain): stays
    // inside the scan's whole-stage pipeline, no per-row boxing — the
    // scalar-UDF form split codegen at exactly the operator whose point
    // is to be a free map-side pre-filter. Narrow integrals widen to
    // long explicitly (the filter hashed them via putLong).
    val probeChild = fam match {
      case "string" => col(colName)
      case _ => col(colName).cast("long")
    }
    df.filter(
      graft.functions.BloomExprs.bloom_might_contain(probeChild, bcast))
  }

  /** Heavy hitters: values whose frequency exceeds `support` fraction of
    * rows (single pass, bounded memory — the "what are the hot keys"
    * question asked before salting a join). May contain false positives
    * (Spark's freqItems is the Karp-Schenker-Papadimitriou one-pass
    * algorithm); verify candidates with an exact count if it matters. */
  def heavyHitters(df: DataFrame, colName: String,
      support: Double = 0.01): Seq[Any] = {
    val row = df.stat.freqItems(Array(colName), support).head()
    row.getSeq[Any](0)
  }

  /** Greenwald-Khanna approximate quantiles (rank error ≤ relErr·N). */
  def approxQuantiles(df: DataFrame, colName: String, probs: Seq[Double],
      relErr: Double = 0.01): Seq[Double] =
    df.stat.approxQuantile(colName, probs.toArray, relErr).toSeq
}
