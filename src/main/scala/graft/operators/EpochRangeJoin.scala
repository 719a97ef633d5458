package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Big×big interval-containment join by epoch bucketing — the missing
  * scale path next to [[graft.plans.RangeJoin]]'s broadcast strategy.
  *
  * The broadcast range join requires one side to fit on every executor;
  * when BOTH sides are large (events × sessions, reads × campaigns at
  * warehouse scale) the standard rewrite is: quantize time into fixed
  * epochs, give each POINT its single epoch, explode each INTERVAL over
  * every epoch it covers, equi-join on (keys…, epoch) — a plain shuffled
  * hash join Spark plans and AQE-skew-splits like any other — then apply
  * the exact containment predicate. Because a point owns exactly ONE
  * epoch, every (point, interval) containment pair is emitted exactly
  * once: no dedup pass, no double counting.
  *
  * Cost model: the join fans the interval side out by
  * ceil(duration/epoch)+1 rows per interval. Pick `epoch` near the
  * TYPICAL interval duration — shorter epochs inflate the interval side,
  * longer epochs put many intervals in one bucket and push work into the
  * post-join filter (degenerating toward the naive cross product per
  * key at epoch → ∞). Both sides stay distributed; nothing broadcasts.
  */
object EpochRangeJoin {

  /** Join `points` (point value in `ptCol`, seconds/long) to `intervals`
    * (`[loCol, hiCol]` INCLUSIVE, same unit) on equal `keys` and
    * containment, via `epoch`-second bucketing. Output: matched rows
    * with the columns of both inputs (the helper epoch column removed);
    * points matching nothing are dropped (inner semantics). */
  def epochRangeJoin(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      keys: Seq[String], epoch: Long): DataFrame = {
    require(epoch > 0, "epochRangeJoin requires a positive epoch")
    val p = points.withColumn("__epoch",
      floor(col(ptCol) / epoch).cast("long"))
    val i = intervals.withColumn("__epoch",
      explode(sequence(floor(col(loCol) / epoch).cast("long"),
        floor(col(hiCol) / epoch).cast("long"))))
    p.join(i, (keys :+ "__epoch").toSeq)
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__epoch")
  }
}
