package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional clustering key
  * behind data-skipping layouts (Delta OPTIMIZE ZORDER, Hudi/Iceberg
  * z-order compaction). Sorting a table by `interleave16(x, y)` places
  * rows close in BOTH dimensions into the same files, so a file-level
  * min/max stats index can skip files for predicates on either column —
  * a single-column sort layout only ever skips on its sort key.
  *
  * The interleave is the classic shift-and-mask bit spread, pure 64-bit
  * integer arithmetic. The (shift, mask) step list is defined ONCE and
  * drives all three forms — the Spark `Column`, the plain-Scala
  * reference used by specs, and the generated DuckDB oracle SQL — so the
  * sides cannot drift (the e02/langid convention).
  *
  * At 100 TB: the z-value is computed map-side (codegen'd bit ops, no
  * shuffle of its own); the one wide stage is the `repartitionByRange`
  * on z that any clustering rewrite needs. Range boundaries come from
  * sampling, the standard Spark mechanism — no driver-side data path.
  */
object ZOrder {

  /** Spread steps: after masking to 16 bits, each (shift, mask) pass
    * doubles the gap between occupied bits; the result has the input's
    * bits at even positions 0,2,..,30. */
  val SpreadSteps: Seq[(Int, Long)] = Seq(
    (8, 0x00FF00FFL),
    (4, 0x0F0F0F0FL),
    (2, 0x33333333L),
    (1, 0x55555555L))

  private val Mask16 = 0xFFFFL

  /** Spark form: spread the low 16 bits of `c` to even bit positions. */
  def spread(c: Column): Column =
    SpreadSteps.foldLeft(c.cast("long").bitwiseAND(lit(Mask16))) {
      case (v, (s, m)) => v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }

  /** Z-value of two columns (low 16 bits each): x at even bit positions,
    * y at odd. Total order on the value walks the Morton curve. */
  def interleave16(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Plain-Scala reference for specs — same steps, same masks. */
  def interleave16Ref(x: Long, y: Long): Long = {
    def spreadRef(v0: Long): Long =
      SpreadSteps.foldLeft(v0 & Mask16) { case (v, (s, m)) =>
        (v | (v << s)) & m
      }
    spreadRef(x) | (spreadRef(y) << 1)
  }

  /** DuckDB oracle fragment: a WITH-chain applying the same steps to
    * both inputs. `from` supplies the source relation (table + WHERE),
    * `carry` the pass-through select list. Emits CTEs `__z0..__zN` and a
    * final SELECT producing column `z`. */
  def interleaveSql(xExpr: String, yExpr: String, from: String,
      carry: String): String = {
    val base = s"SELECT $carry, CAST($xExpr AS BIGINT) & $Mask16 AS xv," +
      s" CAST($yExpr AS BIGINT) & $Mask16 AS yv FROM $from"
    val steps = SpreadSteps.zipWithIndex.map { case ((s, m), i) =>
      val prev = if (i == 0) "__z0" else s"__z$i"
      s"__z${i + 1} AS (SELECT $carry, (xv | (xv << $s)) & $m AS xv," +
        s" (yv | (yv << $s)) & $m AS yv FROM $prev)"
    }
    (s"WITH __z0 AS ($base),\n" + steps.mkString(",\n") +
      s"\nSELECT $carry, xv | (yv << 1) AS z FROM __z${SpreadSteps.size}")
  }
}
