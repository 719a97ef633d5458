package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational operator surface (SURVEY.md §2: A1-A4, W1, P1-P3, O2-O3,
  * D1-D2, U1, F4) re-expressed over the driver test tables.
  *
  * Conventions shared with the DuckDB oracle (see `oracleSql`):
  *   - Double-typed measures are cast per-element to DECIMAL before SUM so
  *     aggregation is exact and order-independent (a parallel double sum is
  *     not associative; at 100 TB the accumulation order is arbitrary).
  *     The final value is cast back to DOUBLE — a deterministic conversion.
  *   - Every query output is a deterministic *set*: no LIMIT without a
  *     total-order tiebreak.
  */
object Relational {

  /** Exact, order-independent sum of a double column: elementwise decimal
    * cast → decimal sum → double. Identical semantics in DuckDB. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2/A3-style grouped aggregation with exact decimal sums (TPC-H Q1 shape).
    "q01_pricing_summary" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
