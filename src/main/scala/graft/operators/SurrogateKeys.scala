package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructField

/** Identity-column emulation (reference: notebooks/01_Init.py:59
  * `GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1)`) — Spark has
  * no identity columns, so insert batches get keys assigned here
  * (SURVEY.md §7.4).
  *
  * Two modes:
  *  - [[assignOrdered]] — exact `START WITH 1 INCREMENT BY 1` semantics via
  *    `row_number()` over a global window. Deterministic given a total
  *    ordering, but serializes through one partition — correct for dimension
  *    tables (thousands–millions of rows), wrong for facts at 100 TB.
  *  - [[assignDistributed]] — per-partition block allocation: count rows per
  *    partition, prefix-sum the offsets, add the partition base inside
  *    `mapPartitions` (what RDD `zipWithIndex` does). Contiguous and unique,
  *    one extra lightweight count pass, no single-partition bottleneck;
  *    row→key assignment depends on partitioning, so use where key *values*
  *    need not be reproducible across runs (Delta identity gives the same
  *    non-determinism).
  */
object SurrogateKeys {

  def assignOrdered(df: DataFrame, idCol: String, orderBy: Seq[Column], offset: Long = 0L): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(orderBy: _*)).cast(LongType) + lit(offset))

  def assignDistributed(df: DataFrame, idCol: String, offset: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(StructField(idCol, LongType, nullable = false))
    val withIds = df.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1 + offset))
    }
    spark.createDataFrame(withIds, schema)
  }
}
