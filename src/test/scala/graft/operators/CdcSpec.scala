package graft.operators

import graft.SparkSpec

/** Semantics pins for [[Cdc.applyChangelog]] — the consuming half of the
  * CDC loop (q37 derives a feed, q74 replays one); the value-level gate
  * is the DuckDB oracle at all SFs.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("applyChangelog: latest op wins, tombstones delete, inserts land, " +
    "untouched base keys pass through") {
    // A untouched; B updated twice (seq 2 wins); C updated then
    // tombstoned (gone); D is a feed-only insert; E tombstoned without
    // ever existing in the base (stays absent — a D on a missing key is
    // a no-op, not an error: compacted feeds replay them routinely).
    val base = Seq(("A", 1.0), ("B", 2.0), ("C", 3.0)).toDF("k", "v")
    val feed = Seq(
      ("B", "U", 1L, 20.0), ("B", "U", 2L, 22.0),
      ("C", "U", 1L, 30.0), ("C", "D", 2L, 0.0),
      ("D", "U", 1L, 40.0),
      ("E", "D", 1L, 0.0)
    ).toDF("k", "op", "seq", "v")
    val got = Cdc.applyChangelog(base, feed, "k", "op",
        seqCols = Seq("seq"), valueCols = Seq("v"))
      .as[(String, Double, String)].collect().toSet
    assert(got === Set(
      ("A", 1.0, "base"), ("B", 22.0, "applied"), ("D", 40.0, "applied")))
  }

  test("applyChangelog is idempotent over a compacted feed: applying " +
    "only each key's final op gives the same state") {
    val base = Seq(("A", 1.0), ("B", 2.0)).toDF("k", "v")
    val full = Seq(("A", "U", 1L, 10.0), ("A", "U", 2L, 11.0),
      ("A", "D", 3L, 0.0), ("B", "U", 1L, 21.0)).toDF("k", "op", "seq", "v")
    val compacted = Seq(("A", "D", 3L, 0.0), ("B", "U", 1L, 21.0))
      .toDF("k", "op", "seq", "v")
    val a = Cdc.applyChangelog(base, full, "k", "op", Seq("seq"), Seq("v"))
      .as[(String, Double, String)].collect().toSet
    val b = Cdc.applyChangelog(base, compacted, "k", "op", Seq("seq"),
      Seq("v")).as[(String, Double, String)].collect().toSet
    assert(a === b)
    assert(a === Set(("B", 21.0, "applied")))
  }
}
