package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement — the
  * hash-priority variant of Efraimidis–Spirakis reservoir sampling
  * ("Weighted random sampling with a reservoir", IPL 2006). Each row gets
  * a priority `h * 1e6 div w` where `h` is an md5-derived 32-bit uniform
  * of the row id and `w` its weight; the sample is the k smallest
  * priorities, so heavier rows win proportionally more often. The
  * linearized key (`u/w` instead of `u^(1/w)`) preserves the
  * weighted-race semantics while staying in exact BIGINT arithmetic —
  * no `pow`/`ln`, so the draw is bit-reproducible across engines,
  * re-partitioning, and re-runs (same no-RNG discipline as the
  * stratified sampler, x31).
  *
  * Scale shape: one codegen'd projection (no shuffle — the hash is
  * content-derived) followed by a global top-k, which Spark executes as
  * TakeOrdered: per-partition k-heaps, then a k·partitions merge on the
  * driver. Sampling a 100 TB corpus never materializes more than
  * k rows per partition.
  */
object Sampling {

  /** k-row weighted sample of `df`. Rows with non-positive weight are
    * excluded (a zero weight cannot win a weighted race). Returns
    * (idCol, weight, priority) ordered by priority, id. */
  def weightedPriority(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "wps|"): DataFrame = {
    val h = conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long")
    df.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("long").as("weight"), h.as("h"))
      .withColumn("priority", expr("(h * 1000000) div weight"))
      .select(col(idCol), col("weight"), col("priority"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }
}
