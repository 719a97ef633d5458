package graft.operators

import graft.Checkpoints._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — the merge-table learner every
  * pre-training pipeline runs before tokenizing a corpus.
  *
  * Scale shape: the corpus is touched EXACTLY ONCE, to build the
  * word-frequency table (the t14 pre-tokenizer split + a groupBy). All
  * `numMerges` iterations then run over that vocabulary relation —
  * millions of rows at web scale, not terabytes — so the iterative part
  * is corpus-size-independent (this is how production BPE trainers are
  * structured: frequencies once, merges over the dictionary).
  *
  * Each iteration: adjacent-symbol pair counts weighted by word
  * frequency → the argmax pair (ONE row to the driver — the algorithm's
  * sequential dependency, the PageRank-scalar pattern) → a map-only
  * left-to-right fold replacing non-overlapping occurrences. The
  * vocabulary is `localCheckpoint`ed per round (the connected-components
  * convention) so lineage stays flat across iterations.
  *
  * Ties on pair count break (left, right) lexicographically — the merge
  * table is deterministic at any partitioning.
  *
  * Reference behavior: the classic BPE trainer (Sennrich et al. 2016);
  * the reference repo stops at pre-tokenization, so this extends the
  * training-pipeline surface per the build brief.
  */
object Bpe {

  /** Left-to-right non-overlapping replacement of the (l, r) symbol pair
    * with l+r: a fold over the symbol array. After a merge the new
    * symbol becomes the accumulator tail and cannot itself complete an
    * overlapping (l, r) occurrence (l+r = l would need r empty). HOF
    * lambdas are interpreted (CodegenFallback) — acceptable here by the
    * vocab-sized-input contract; never lift this onto a corpus-sized
    * relation. */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    when(size(syms) < 2, syms).otherwise(
      aggregate(
        slice(syms, lit(2), size(syms) - 1),
        array(element_at(syms, 1)),
        (acc, s) =>
          when(element_at(acc, -1) === l && s === r,
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(s)))))

  /** Test-only exposure of the training fold: the encode expression
    * ([[graft.functions.BpeEncode]]) must agree with it piece-for-piece. */
  private[operators] def applyMergeForTest(syms: Column, l: String,
      r: String): Column = applyMerge(syms, l, r)

  /** Learn `numMerges` BPE merges from `df`'s `textCol`. Returns the
    * merge table: (rank, left, right, merged, pair_count), rank 1 = the
    * first (highest-count) merge. Stops early if no pair remains. */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // the one corpus-scale pass: pre-tokenize and count words
    // initial symbols = the word's characters (split(w, "") would keep a
    // trailing "" under Spark's limit=-1 semantics — substr is exact)
    var vocab = df
      .select(explode(regexp_extract_all(col(textCol),
        lit(DataOps.BpePattern), lit(0))).as("__w"))
      .groupBy($"__w").agg(count(lit(1)).as("__freq"))
      .select(transform(sequence(lit(1), length($"__w")),
        i => $"__w".substr(i, lit(1))).as("__syms"), $"__freq")
      .graftCheckpoint()

    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = vocab
        .filter(size($"__syms") >= 2)
        .select($"__freq", explode(transform(
          sequence(lit(0), size($"__syms") - 2),
          i => struct(get($"__syms", i).as("l"),
            get($"__syms", i + 1).as("r")))).as("__p"))
        .groupBy($"__p.l", $"__p.r")
        .agg(sum($"__freq").as("__cnt"))
        .orderBy($"__cnt".desc, $"l".asc, $"r".asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((rank, l, r, l + r, cnt))
        vocab = vocab
          .select(applyMerge($"__syms", l, r).as("__syms"), $"__freq")
          .graftCheckpoint()
        rank += 1
      }
    }
    merges.result()
      .toDF("rank", "left", "right", "merged", "pair_count")
  }
}
