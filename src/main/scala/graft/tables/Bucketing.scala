package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed catalog tables for co-located joins — the pre-shuffle
  * investment that pays at 100 TB: two tables bucketed and sorted on the
  * same key join with ZERO exchanges (scan → sort-merge join directly),
  * so a fact table written once joins its dimensions forever without
  * reshuffling. PlanSpec asserts the no-Exchange property mechanically.
  */
object Bucketing {

  /** Write a DataFrame as a bucketed+sorted managed table (session catalog,
    * parquet). Buckets must match on both sides of a co-located join. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** True when the executed plan contains no SHUFFLE exchange
    * (`Exchange hashpartitioning`/`rangepartitioning`); broadcast
    * exchanges don't move the big side and don't count. */
  def isShuffleFree(df: DataFrame): Boolean = {
    df.collect() // force AQE to finalize the physical plan
    val plan = finalPlanString(df)
    !plan.contains("Exchange hashpartitioning") && !plan.contains("Exchange rangepartitioning")
  }

  /** AQE plans print both the final and the initial plan; keep only the
    * final section so operators aren't double-counted. */
  def finalPlanString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)

  /** Co-located join of two bucketed tables on the bucket key. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
