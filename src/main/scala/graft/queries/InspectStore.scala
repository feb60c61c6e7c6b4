package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev tool: run the medallion pipeline (q23's body) into a scratch store
  * and print every table's file count and byte sizes — the §6 output-sizing
  * evidence the optimization round needs (the bench's Scratch.seal deletes
  * the store before it can be inspected). Not a query; not in SparkEntry.
  */
object InspectStore {
  def main(args: Array[String]): Unit = {
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

    val root = java.nio.file.Files.createTempDirectory("graft_inspect")
    val store = new graft.tables.TableStore(spark, root.toString)
    val t0 = System.nanoTime()
    new graft.pipeline.Medallion(spark, store, sfDir)
      .run(org.apache.spark.sql.functions.lit("2024-01-01 00:00:00"))
    println(f"medallion run: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(root)
    val files = try walk.iterator().asScala.toVector finally walk.close()
    val parquets = files.filter(_.getFileName.toString.endsWith(".parquet"))
    parquets.groupBy(p => root.relativize(p).toString.split('/').take(2).mkString("/"))
      .toSeq.sortBy(_._1)
      .foreach { case (tbl, fs) =>
        val sizes = fs.map(f => java.nio.file.Files.size(f))
        println(f"$tbl%-40s files=${fs.size}%4d total=${sizes.sum / 1024}%8d KB " +
          f"min=${sizes.min / 1024}%6d KB max=${sizes.max / 1024}%6d KB")
      }
    store.detach()
    Scratch.deleteRecursively(root)
    spark.stop()
  }
}
