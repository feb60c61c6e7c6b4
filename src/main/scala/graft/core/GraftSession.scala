package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Design point (SURVEY.md §4): the engine leans on Catalyst + AQE for all
  * physical planning. Local mode is a stand-in for a multi-executor cluster:
  * shuffle partitions track the core count here, and would track
  * `spark.sql.shuffle.partitions` sized to cluster cores at scale; AQE
  * coalesces / skew-splits at runtime either way.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors().min(32)): SparkSession = {
    val spark = SparkSession
      .builder()
      .withExtensions(new graft.ext.GraftExtensions)
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE coalesce partitions inside persisted plans too: the
      // dedup/ANN operators persist small intermediates whose full-width
      // shuffles are task-overhead-bound at high core counts (measured
      // 3x on minhash LSH at local[32]); nothing in the engine depends
      // on a cached plan's output partitioning
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse_${ProcessHandle.current().pid()}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
