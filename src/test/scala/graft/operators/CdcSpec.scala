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

  test("mergeAggregates: merge(view(R), agg(dR)) = view(R u dR) at any " +
    "cutoff; a net-zero key LEAVES the view, a fresh key enters, an " +
    "untouched key passes through") {
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    // signed rows (user, n-weight, cents): user 1 nets to zero after
    // the deltas; user 2 is untouched; user 3 is delta-only
    val rows = Seq(
      (1L, 1L, 500L), (1L, 1L, 300L),            // base: n 2, cents 800
      (2L, 1L, 100L),                            // base only
      (1L, -1L, -500L), (1L, -1L, -300L),        // deltas: retract both
      (3L, 1L, 700L))                            // delta-only insert
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"u").agg(sum($"w").as("n"), sum($"c").as("cents"))
    val all = rows.toDF("u", "w", "c")
    val want = agg(all)
      .filter($"n" =!= 0L || $"cents" =!= 0L)
      .as[(Long, Long, Long)].collect().toSet
    for (cut <- Seq(2, 3, 4)) {
      val base = rows.take(cut).toDF("u", "w", "c")
      val delta = rows.drop(cut).toDF("u", "w", "c")
      val got = Cdc.mergeAggregates(agg(base), agg(delta), "u",
        Seq("n", "cents")).as[(Long, Long, Long)].collect().toSet
      assert(got === want, s"cutoff $cut")
    }
    assert(want === Set((2L, 1L, 100L), (3L, 1L, 700L)))
    assert(!want.exists(_._1 == 1L), "net-zero key must leave the view")
  }
}
