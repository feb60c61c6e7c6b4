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
        // subdirectory, so getCheckpointDir never string-equals `dir` and
        // substring checks false-match (a basename that is a prefix of the
        // old root, or of the UUID itself). The checkpoint dir is
        // SparkContext-GLOBAL while this conf is session-scoped, so the
        // guard must compare against the context's actual state: the
        // PARENT of the current checkpoint path is exactly the qualified
        // root last applied — re-set only when the configured root
        // differs (one remote mkdirs per root; a reconfigured root, or
        // another session having moved the context's dir, always takes
        // effect).
        val sc = spark.sparkContext
        val p = new org.apache.hadoop.fs.Path(dir)
        val qualified = p.getFileSystem(sc.hadoopConfiguration).makeQualified(p)
        val current = sc.getCheckpointDir
          .map(d => new org.apache.hadoop.fs.Path(d).getParent)
        if (!current.contains(qualified)) sc.setCheckpointDir(dir)
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
