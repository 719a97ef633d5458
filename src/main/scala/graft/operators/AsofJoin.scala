package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the latest right row
  * whose time is ≤ the left row's time, per key — the standard align
  * operation for event streams and time series (Spark has no built-in;
  * DuckDB/Pandas call it ASOF JOIN / merge_asof).
  *
  * Composed from built-ins (preference (a) in the custom-operator ladder):
  * union both sides tagged, then one `last(ignoreNulls)` running window
  * per carried column over (key, time, side) ordering. Cost = ONE shuffle
  * on the key + a sort within partitions — same as a sort-merge join,
  * with no risk of the range-explosion a naive inequality join has
  * (`l.ts >= r.ts` alone is O(n·m) pairs before filtering).
  *
  * Right rows sort BEFORE left rows at equal timestamps (side 0 < 1), so
  * the match is inclusive: a right row at exactly t matches a left row at
  * t — DuckDB ASOF semantics.
  */
object AsofJoin {

  /** @param rightCols right-side columns to carry onto matching left rows
    * @param rightTieBreak unique right column ordering ties at identical
    *   (key, time) — the LAST right row in this order wins
    */
  def backward(left: DataFrame, right: DataFrame, timeCol: String,
      keyCols: Seq[String], rightCols: Seq[String],
      rightTieBreak: String): DataFrame = {
    // Carried values ride in ONE struct per right row: the struct itself
    // is never null for a right row (even when every field is), so
    // last(ignoreNulls) tracks "latest right ROW" — a null field on the
    // true latest match stays null instead of leaking an older row's
    // value.
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(rightCols.map(c =>
          org.apache.spark.sql.types.StructField(c,
            right.schema(c).dataType)))))
    val r = right.select(
      (keyCols.map(col) :+ col(timeCol) :+
        col(rightTieBreak).cast("long").as("__tie") :+
        struct(rightCols.map(col): _*).as("__r")): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    val out = filled.filter(col("__side") === 1)
    rightCols.foldLeft(out)((df, c) =>
        df.withColumn(s"asof_$c", col("__r").getField(c)))
      .drop("__side", "__tie", "__r")
  }

  /** FORWARD as-of: for every left row, the EARLIEST right row whose
    * time is ≥ the left row's time, per key — the label-lookahead form a
    * training pipeline uses ("first purchase AFTER signup", "next error
    * after deploy"). Implemented as [[backward]] over the negated
    * epoch-second time (latest ≤ −t ⟺ earliest ≥ t; the union-window
    * trick, its one shuffle, and the inclusive-at-equal-times tie rule
    * all carry over unchanged). Among right rows at the exact matched
    * time the LARGEST `rightTieBreak` wins (backward's last-in-frame
    * discipline under the negated ordering) — pin unique (key, time)
    * pairs if that matters. */
  def forward(left: DataFrame, right: DataFrame, timeCol: String,
      keyCols: Seq[String], rightCols: Seq[String],
      rightTieBreak: String): DataFrame =
    backward(
      left.withColumn("__negt", -col(timeCol).cast("long")),
      right.withColumn("__negt", -col(timeCol).cast("long"))
        .drop(timeCol),
      "__negt", keyCols, rightCols, rightTieBreak)
      .drop("__negt")

  /** Variant with a tolerance: matches older than `toleranceSeconds` are
    * nulled out (carries the matched right time to enforce it). */
  def backwardWithTolerance(left: DataFrame, right: DataFrame, timeCol: String,
      keyCols: Seq[String], rightCols: Seq[String], rightTieBreak: String,
      toleranceSeconds: Long): DataFrame = {
    val withTs = backward(left,
      right.withColumn("__rts", col(timeCol)), timeCol, keyCols,
      rightCols :+ "__rts", rightTieBreak)
    val stale: Column =
      col(timeCol).cast("long") - col("asof___rts").cast("long") > toleranceSeconds
    rightCols.foldLeft(withTs)((df, c) =>
        df.withColumn(s"asof_$c", when(stale, lit(null)).otherwise(col(s"asof_$c"))))
      .drop("asof___rts")
  }
}
