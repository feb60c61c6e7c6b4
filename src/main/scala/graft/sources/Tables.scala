package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer over the parquet testdata directory layout
  * (TESTDATA.md): one parquet file-or-dir per table under a scale-factor
  * directory.
  *
  * Mirrors the reference's source abstraction (SURVEY.md §2.1 S1/S2): the
  * reference reads JDBC snapshots into managed tables and then reads those
  * by name (`spark.table(...)`, 22_ETL_Silver_PySpark.py:45). Here the same
  * role is a pluggable reader keyed by logical table name; a JDBC-backed
  * implementation would swap in behind the same signature for live sources.
  * Reads are plain `spark.read.parquet`, so Catalyst predicate pushdown /
  * column pruning reach the scan untouched.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table of a scale-factor dir as a temp view (SQL surface,
    * SURVEY.md §7.1 step 5 — the warehouse-parity endpoint). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
