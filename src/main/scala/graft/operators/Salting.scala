package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: salted two-phase aggregation and salted
  * replicated joins (SURVEY.md §4 / the 100 TB design point — AQE's skew
  * handling covers sort-merge joins, but hot-key aggregations and
  * broadcast-averse joins still need explicit salting).
  *
  * Salts are derived from `xxhash64` of row content — deterministic, so
  * results are reproducible and oracle-checkable (the salt only changes
  * physical distribution, never the logical result).
  */
object Salting {

  /** Deterministic salt in [0, buckets). */
  def saltCol(buckets: Int, from: Column*): Column =
    pmod(xxhash64(from: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase salted SUM/COUNT aggregation: phase 1 aggregates on
    * (keys, salt) — spreading each hot key over `buckets` reducers — and
    * phase 2 combines the partials. Logical result identical to a direct
    * groupBy; physical max-partition size divided by `buckets`. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
      buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(buckets, df.columns.map(col): _*))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
  }

  /** Salted join for a skewed big side against a non-broadcastable small
    * side: the big side gets a content-derived salt, the small side is
    * replicated `buckets`× with every salt value, and the join key becomes
    * (keys, salt) — each hot key's rows land on `buckets` different
    * reducers instead of one. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    val bigSalted = big.withColumn("__salt", saltCol(buckets, big.columns.map(col): _*))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(smallReplicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
