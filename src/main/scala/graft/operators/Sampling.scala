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

  /** Water-filling mixture allocation — the PLANNING step upstream of the
    * replication (x41) and budget-cap (x67) operators: given each group's
    * available token mass and a target mixture share, compute how many
    * tokens to actually take per group for a total budget of
    * `budgetNum/budgetDen` of the corpus. A group whose supply can't meet
    * its share exhausts; its unmet demand redistributes across the
    * remaining groups PROPORTIONALLY TO THEIR SHARES over `rounds` fixed
    * passes (the iterative water-filling that a single proportional split
    * gets wrong — redistributed surplus can itself exhaust a second
    * group).
    *
    * All arithmetic integer (shares in micro-units, floor division), so
    * the plan replays exactly. Shape: the group frame is
    * mixture-cardinality (a handful of rows); each round is one scalar
    * aggregation broadcast back as a 1-row frame — nothing here ever
    * touches corpus rows, which is the point: the plan runs on the
    * aggregate the profile query (x54) already pays for.
    *
    * @param avail  (grpCol, availCol) — token supply per group
    * @param shares target mixture in micro-units per group name; groups
    *               absent from the map are dropped from the plan
    */
  def waterFill(avail: DataFrame, shares: Map[String, Long],
      budgetNum: Long, budgetDen: Long, rounds: Int = 3,
      grpCol: String = "grp", availCol: String = "avail"): DataFrame = {
    require(rounds >= 1, "need at least one allocation round")
    require(budgetNum > 0 && budgetDen > 0, "budget fraction must be positive")
    val spark = avail.sparkSession
    import spark.implicits._
    val tgt = shares.toSeq.toDF("grp", "share_micro")
    val base = avail
      .select(col(grpCol).cast("string").as("grp"),
        col(availCol).cast("long").as("avail"))
      .join(broadcast(tgt), Seq("grp"))
    val budget = base.agg(
      expr(s"(sum(avail) * ${budgetNum}L) div ${budgetDen}L").as("budget"))
    var cur = base.crossJoin(broadcast(budget))
      .withColumn("alloc",
        least(col("avail"), expr("(budget * share_micro) div 1000000L")))
    for (_ <- 2 to rounds) {
      val scal = cur.agg(
        coalesce(sum(col("alloc")), lit(0L)).as("allocated"),
        coalesce(sum(when(col("alloc") < col("avail"), col("share_micro"))),
          lit(0L)).as("rem_share"))
      cur = cur.crossJoin(broadcast(scal))
        .withColumn("alloc",
          when(col("alloc") === col("avail"), col("alloc"))
            .otherwise(least(col("avail"),
              col("alloc") + expr(
                "CASE WHEN rem_share = 0 THEN 0L " +
                "ELSE ((budget - allocated) * share_micro) div rem_share END"))))
        .drop("allocated", "rem_share")
    }
    cur.select(col("grp"), col("avail"), col("share_micro"), col("budget"),
      col("alloc"), (col("alloc") === col("avail")).as("exhausted"))
  }
}
