package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable bronze-ingest source (SURVEY.md §2.1 S1): the reference reads
  * JDBC snapshots (reference: notebooks/12_ETL_Bronze_PySpark.py:14-26,
  * 61-128); our tests read parquet. Both implement the same read-by-name
  * contract, so the medallion pipeline and a future Structured Streaming
  * ingest swap sources without touching stage logic.
  */
trait Source {
  def read(spark: SparkSession, table: String): DataFrame
}

/** Parquet-directory source — the offline stand-in used by tests/bench. */
final class ParquetSource(dir: String) extends Source {
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")
}

/** Live JDBC source mirroring the reference's bronze ingest: full-snapshot
  * reads with schema inferred from source metadata. `partitionColumn`
  * options can be layered per-table for parallel extraction at scale —
  * the reference reads serially (single-node, 32k-row source), which is
  * exactly the part that would not survive 100 TB. */
final class JdbcSource(url: String, props: Properties,
    schema: String = "SalesLT") extends Source {
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.jdbc(url, s"$schema.$table", props)

  /** Range-partitioned parallel extraction — one JDBC cursor per partition
    * over `[lower, upper)` stripes of `column`; the shape the reference's
    * serial single-cursor ingest needs at scale. */
  def readPartitioned(spark: SparkSession, table: String, column: String,
      lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(url, s"$schema.$table", column, lower, upper, numPartitions, props)
}
