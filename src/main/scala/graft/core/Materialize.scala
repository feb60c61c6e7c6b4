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

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey) match {
      case Some(dir) if dir.nonEmpty =>
        // setCheckpointDir qualifies the path and appends a random UUID
        // subdirectory, so getCheckpointDir never string-equals `dir`:
        // the guard has to compare the configured ROOT (its last path
        // segment), or every loop round re-runs the remote mkdirs and
        // scatters checkpoints over fresh UUID directories
        val rootName = new org.apache.hadoop.fs.Path(dir).getName
        if (!spark.sparkContext.getCheckpointDir.exists(_.contains(rootName)))
          spark.sparkContext.setCheckpointDir(dir)
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
