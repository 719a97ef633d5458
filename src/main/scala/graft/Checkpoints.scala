package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-configurable lineage truncation for the iterative operators
  * (graph rounds, clustering fixpoints, BPE training, index builds).
  *
  * Every delta-iteration in this engine must cut its lineage per round or
  * the plan grows without bound (analysis cost goes quadratic, a failure
  * recomputes every earlier round). HOW it cuts is a deployment decision,
  * not an algorithm decision, so it is one session conf:
  *
  *   `graft.checkpoint = local` (default)
  *     `Dataset.localCheckpoint`: blocks live in executor storage
  *     (memory-and-disk), zero extra I/O. On `local[*]` — and on clusters
  *     whose executors don't get preempted — this is strictly cheapest.
  *     The trade: lineage is TRUNCATED, so a lost executor loses blocks
  *     that have no recompute path — the job dies. Single-node and
  *     reliable-node clusters only.
  *
  *   `graft.checkpoint = reliable`
  *     `Dataset.checkpoint` into `spark.checkpoint.dir` (HDFS/S3/DBFS —
  *     must be set via `SparkContext.setCheckpointDir`; we fail loudly at
  *     first use if it is not). Each round pays a distributed write, and
  *     buys executor-loss survival: any lost partition re-reads from the
  *     checkpoint store instead of killing the job. The right mode on
  *     preemptible/spot fleets, where a 10-round PageRank would otherwise
  *     restart from zero on any single preemption.
  *
  *   `graft.checkpoint = reliable:<dir>`
  *     Same, but sets the checkpoint dir first (idempotent) — the
  *     one-line form for notebooks and tests.
  *
  * Both paths are value-identical by construction (they materialize the
  * same rows; only the storage substrate differs) — CheckpointStrategySpec
  * pins that for the graph family. All call sites use the eager form: the
  * iterative loops REQUIRE materialization-now semantics (the next round's
  * plan must build on data, not on a pending subtree).
  */
object Checkpoints {

  /** Current strategy string for a session — mode token normalized to
    * lowercase, any `reliable:<dir>` path kept verbatim (paths are
    * case-sensitive). */
  def strategy(s: SparkSession): String = {
    val raw = s.conf.get("graft.checkpoint", "local").trim
    val cut = raw.indexOf(':')
    if (cut < 0) raw.toLowerCase
    else raw.substring(0, cut).toLowerCase + raw.substring(cut)
  }

  implicit final class CheckpointOps(private val df: DataFrame)
      extends AnyVal {
    /** Truncate lineage according to the session's `graft.checkpoint`
      * strategy. Drop-in for the eager `localCheckpoint(true)` every
      * iterative operator used to hard-code. */
    def graftCheckpoint(eager: Boolean = true): DataFrame = {
      val s = df.sparkSession
      strategy(s) match {
        case "local" | "" => df.localCheckpoint(eager)
        case "reliable" =>
          if (s.sparkContext.getCheckpointDir.isEmpty)
            throw new IllegalStateException(
              "graft.checkpoint=reliable requires a checkpoint dir: call " +
                "SparkContext.setCheckpointDir(...) or use " +
                "graft.checkpoint=reliable:<dir>")
          df.checkpoint(eager)
        case r if r.startsWith("reliable:") =>
          val dir = r.stripPrefix("reliable:")
          if (!s.sparkContext.getCheckpointDir.contains(dir))
            s.sparkContext.setCheckpointDir(dir)
          df.checkpoint(eager)
        case other =>
          throw new IllegalArgumentException(
            s"graft.checkpoint='$other' (expected local | reliable | reliable:<dir>)")
      }
    }
  }
}
