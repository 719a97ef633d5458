package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Value-level goldens for the reference's three published test queries
  * (reference README.md:267-320) over the full 881-file corpus replay.
  *
  * The expected values were computed INDEPENDENTLY with DuckDB over the
  * replayed tables (parquet dump of the tracking/events pipelines), so
  * these pin the whole path — CSV parse → python-literal explode →
  * projection → SQL aggregation — not just Spark against itself.
  *
  * Tie discipline: Q1 orders by the unique group key (minute), so its
  * 1000-row LIMIT prefix is a deterministic set and we pin its exact
  * aggregates and endpoints. Q2 orders by total_events DESC and the
  * boundary DOES straddle a tie (211 codes share the 1000th count of 27;
  * any 51 of them may appear), so we pin only tie-insensitive facts: the
  * multiset of counts is deterministic even though the chosen codes are
  * not. Q3's top-10 is strictly separated (rank 10 at 87482, next below),
  * so all ten rows are pinned exactly.
  */
class ReferenceGoldenSpec extends SparkSpec {
  import spark.implicits._

  test("ref_q1 golden: per-minute tracking counts (deterministic 1000-row prefix)") {
    val rows = ReferenceQueries.q1(spark)
      .select(date_format($"minute", "yyyy-MM-dd HH:mm").as("m"),
        $"total_trackings".cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.length === 1000)
    assert(rows.map(_._1) === rows.map(_._1).sorted, "must be minute-ascending")
    assert(rows.head === ("2023-04-13 18:04", 1L))
    assert(rows.last._1 === "2023-07-04 17:44")
    assert(rows.map(_._2).sum === 1452L)
    assert(rows.map(_._2).min === 1L)
    assert(rows.map(_._2).max === 15L)
  }

  test("ref_q2 golden: per-code event counts (tie-insensitive aggregates)") {
    val counts = ReferenceQueries.q2(spark)
      .select($"total_events".cast("long")).collect().map(_.getLong(0)).toSeq
    assert(counts.length === 1000)
    assert(counts === counts.sorted.reverse, "must be count-descending")
    assert(counts.sum === 34773L)
    assert(counts.min === 27L)
    assert(counts.max === 1882L)
    // boundary shape: 949 codes sit strictly above the 1000th count, so
    // exactly 51 of the 211 count-27 codes fill the limit
    assert(counts.count(_ == 27L) === 51)
  }

  test("ref_q2_deterministic: tiebreak pins the tie members, aggregates match the verbatim q2") {
    val rows = ReferenceQueries.q2Deterministic(spark)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.length === 1000)
    // same deterministic projection as the verbatim q2 golden
    val counts = rows.map(_._2)
    assert(counts === counts.sorted.reverse)
    assert(counts.sum === 34773L && counts.min === 27L && counts.max === 1882L)
    assert(counts.count(_ == 27L) === 51)
    // what the twin ADDS: WHICH tie members fill the limit is pinned —
    // within each count, codes ascend, so the row set is a pure function
    // of the data (the verbatim q2's one partitioning-dependent freedom)
    rows.groupBy(_._2).values.foreach { grp =>
      val codes = grp.map(_._1)
      assert(codes === codes.sorted, "ties must be trackingCode-ascending")
    }
    // stable under re-partitioning BY CONSTRUCTION: re-run equals run
    val again = ReferenceQueries.q2Deterministic(spark)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(again === rows)
  }

  test("ref_q3 golden: top-10 descriptions, exact values") {
    val got = ReferenceQueries.q3(spark)
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0),
        r.getLong(1), r.getInt(2)))
      .toSeq
    val expected = Seq(
      ("TRANSFERENCIA", 495733L, 1),
      ("Objeto em trânsito - por favor aguarde", 316855L, 2),
      ("ENTRADA", 275305L, 3),
      (null, 144967L, 4),
      ("Objeto postado", 112241L, 5),
      ("EM ROTA", 100227L, 6),
      ("EMISSAO", 98234L, 7),
      ("TRANSFERIDO PARA UNIDADE", 95365L, 8),
      ("ENTREGUE", 89196L, 9),
      ("Objeto saiu para entrega ao destinatário", 87482L, 10))
    assert(got === expected)
  }
}
