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

  /** §2.5 input-parallelism guard for CPU-dense per-row pipelines
    * (regex quality scoring, shingle/token explodes, hashing): a scan
    * whose planned split count is below the session's parallelism
    * serializes every downstream map-side computation into those few
    * tasks — a single-row-group parquet file (the bench inputs; any
    * small or unsplittable input) runs them in ONE task while the other
    * cores idle. When that is the case, hash-repartition on `keys` right
    * after the read so the expensive projection runs at session
    * parallelism; a corpus-scale table already has more splits than the
    * session width and passes through UNTOUCHED — no shuffle is ever
    * added at scale, so this is the guide's "repartition immediately
    * after the read" remedy gated to the inputs that need it. Partition
    * count probing plans the scan-only frame (driver-side, metadata
    * only, no job). */
  def fanOut(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val want = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= want) df
    else if (keys.isEmpty) df.repartition(want)
    else df.repartition(want, keys: _*)
  }

  /** Register every table of a scale-factor dir as a temp view (SQL surface,
    * SURVEY.md §7.1 step 5 — the warehouse-parity endpoint). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
