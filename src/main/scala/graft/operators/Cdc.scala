package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Change-data operators — the warehouse-side complement of the CDC
  * ingestion pipeline:
  *
  *   - snapshotDiff: given two keyed snapshots, emit the minimal change
  *     set (I/U/D rows) that turns old into new — one full-outer join on
  *     the key, the standard way to RE-DERIVE a change feed when the
  *     source system can't produce one.
  *   - scd2: collapse a version history into type-2 slowly-changing-
  *     dimension validity intervals (valid_from/valid_to, current flag) —
  *     one window pass per key, no self-join.
  */
object Cdc {

  /** Minimal change set turning `oldDf` into `newDf` (both keyed by
    * `key`). Output: key, op ('I'/'U'/'D'), old/new values per compared
    * column. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty,
      "snapshotDiff needs at least one compared column")
    // explicit presence markers: a row whose compared columns are all
    // null must still count as present (null-sniffing would misclassify)
    val o = oldDf.select(col(key).as("__ok") +: lit(true).as("__old") +:
      compareCols.map(c => col(c).as(s"old_$c")): _*)
    val n = newDf.select(col(key).as("__nk") +: lit(true).as("__new") +:
      compareCols.map(c => col(c).as(s"new_$c")): _*)
    // null-SAFE key join: a null-keyed row present in both snapshots is
    // one (possibly updated) row, not a spurious delete+insert pair
    val joined = o.join(n, col("__ok") <=> col("__nk"), "full_outer")
    val changed = compareCols.map(c =>
      !(col(s"old_$c") <=> col(s"new_$c"))).reduce[Column](_ || _)
    val oldExists = col("__old").isNotNull
    val newExists = col("__new").isNotNull
    joined
      .withColumn("op",
        when(!oldExists && newExists, "I")
          .when(oldExists && !newExists, "D")
          .when(changed, "U"))
      .filter(col("op").isNotNull)
      .select(coalesce(col("__ok"), col("__nk")).as(key) +: col("op") +:
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Type-2 SCD intervals from a version history: one row per version
    * with [valid_from, valid_to) and an is_current flag; valid_to of the
    * latest version is null. `versionTs` must be unique per key (CDC
    * ingest guarantees this via the file/batch ordering). */
  def scd2(history: DataFrame, key: String, versionTs: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(versionTs).asc)
    history
      .withColumn("valid_from", col(versionTs))
      .withColumn("valid_to", lead(col(versionTs), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Re-derived change feed: per-user value totals over the first half
    // of the month vs the whole month → I (new users)/U (changed totals).
    "q37_snapshot_diff" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      def totals(df: DataFrame) = df.groupBy($"user_id")
        .agg(sum($"value".cast("decimal(18,2)")).cast("double").as("total"),
          count(lit(1)).as("n"))
      val old = totals(ev.filter($"ts" < lit("2024-01-15").cast("timestamp")))
      val neu = totals(ev)
      snapshotDiff(old, neu, "user_id", Seq("total", "n"))
    },

    // SCD2 over each user's event history (event_id as the version order
    // surrogate; unique per key by construction).
    "q38_scd2" -> { (s, d) =>
      import s.implicits._
      val hist = Tables.events(s, d)
        .select($"user_id", $"event_id", $"event_type", $"value")
      scd2(hist, "user_id", "event_id")
        .select($"user_id", $"event_id", $"event_type",
          $"valid_from", $"valid_to", $"is_current")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q37_snapshot_diff" ->
      """WITH old AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |    COUNT(*) AS n
        |  FROM events WHERE ts < TIMESTAMP '2024-01-15' GROUP BY user_id),
        |neu AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |    COUNT(*) AS n
        |  FROM events GROUP BY user_id),
        |j AS (SELECT coalesce(old.user_id, neu.user_id) AS user_id,
        |        old.total AS old_total, neu.total AS new_total,
        |        old.n AS old_n, neu.n AS new_n
        |      FROM old FULL OUTER JOIN neu ON old.user_id = neu.user_id)
        |SELECT user_id,
        |  CASE WHEN old_total IS NULL AND old_n IS NULL THEN 'I'
        |       WHEN new_total IS NULL AND new_n IS NULL THEN 'D'
        |       WHEN old_total IS DISTINCT FROM new_total
        |         OR old_n IS DISTINCT FROM new_n THEN 'U' END AS op,
        |  old_total, new_total, old_n, new_n
        |FROM j
        |WHERE CASE WHEN old_total IS NULL AND old_n IS NULL THEN 'I'
        |           WHEN new_total IS NULL AND new_n IS NULL THEN 'D'
        |           WHEN old_total IS DISTINCT FROM new_total
        |             OR old_n IS DISTINCT FROM new_n THEN 'U' END IS NOT NULL""".stripMargin,

    "q38_scd2" ->
      """SELECT user_id, event_id, event_type,
        |  event_id AS valid_from,
        |  LEAD(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id)
        |    AS valid_to,
        |  LEAD(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id)
        |    IS NULL AS is_current
        |FROM events""".stripMargin
  )
}
