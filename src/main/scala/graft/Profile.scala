package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Dev tool: run one named query from [[SparkEntry.queries]] with a
  * job-level listener, printing each Spark job's wall time and call site —
  * the quickest way to see which phase of a multi-job operator (quantile
  * sketch, rewrite, commit, read-back) actually costs the seconds the
  * bench reports. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Profile q44_zorder_read"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Profile <query-name>"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.ext.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse_${ProcessHandle.current().pid()}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val runStart = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    def off(t: Long): Double = (t - runStart.get()) / 1e9
    val starts = TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          // fall back to the result stage's call site — SQL-executed jobs
          // carry no description but every stage names its action site
          .orElse(js.stageInfos.lastOption.map(si =>
            si.name + " [" + js.stageInfos.map(_.numTasks).sum + " tasks/" +
              js.stageInfos.size + " stages]"))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.get(je.jobId).foreach { case (t0, site) =>
          val now = System.nanoTime()
          println(f"[job ${je.jobId}%3d] ${(now - t0) / 1e9}%7.3f s  " +
            f"(at ${off(t0)}%6.3f..${off(now)}%6.3f)  $site")
        }
    })

    val fn = SparkEntry.queries(name)
    (1 to 2).foreach { i =>
      println(s"=== run $i of $name ===")
      val t0 = System.nanoTime()
      runStart.set(t0)
      val n = fn(spark, sfDir).count()
      println(f"=== run $i total ${(System.nanoTime() - t0) / 1e9}%.3f s, $n rows ===")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
