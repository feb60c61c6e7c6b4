package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for the engine's iterative operators
  * (connected-component label propagation, PageRank, incremental dedup /
  * novelty indexes, segmented BPE encode): each loop round must cut the
  * plan so lineage and analysis cost never compound across rounds.
  *
  * Two modes, chosen per SESSION (no per-operator API churn):
  *
  *  - default: `localCheckpoint()` — blocks live in executor storage.
  *    Fastest, and exactly right single-JVM (the sandbox, local[32]); on a
  *    real cluster a lost executor loses blocks the truncated lineage can
  *    no longer recompute, failing the job.
  *  - reliable: set `spark.graft.checkpointDir` (a fault-tolerant path —
  *    HDFS/S3 on a cluster) on the session and every iterative
  *    materialization becomes a reliable `checkpoint()` — loop state
  *    survives executor loss, the standard long-loop posture at 1000
  *    executors. Results are bit-identical (both modes only materialize;
  *    they never change semantics — pinned by CheckpointModeSpec).
  */
object Materialize {

  /** Session conf key opting iterative materializations into reliable
    * checkpoints; its value is the checkpoint directory. */
  val DirKey = "spark.graft.checkpointDir"

  /** Session conf marker recording the root most recently passed to
    * `setCheckpointDir`, so the idempotence guard is exact equality on
    * the configured value rather than a substring heuristic. */
  private val AppliedKey = "spark.graft.checkpointDir.applied"

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey) match {
      case Some(dir) if dir.nonEmpty =>
        // setCheckpointDir qualifies the path and appends a random UUID
        // subdirectory, so getCheckpointDir never string-equals `dir` and
        // substring checks false-match (a basename that is a prefix of the
        // old root, or of the UUID itself). Record the exact dir we last
        // applied in the session conf instead: re-set only when the
        // configured root actually changed — one remote mkdirs per root,
        // and a reconfigured root always takes effect.
        if (!spark.conf.getOption(AppliedKey).contains(dir)) {
          spark.sparkContext.setCheckpointDir(dir)
          spark.conf.set(AppliedKey, dir)
        }
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
  }

  /** `.materialized` postfix syntax so call sites read like the
    * `.localCheckpoint()` they replace. */
  implicit class MatOps(private val df: DataFrame) extends AnyVal {
    def materialized: DataFrame = Materialize(df)
  }
}
