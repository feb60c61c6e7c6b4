package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global training-order shuffle + shard layout — the last
  * step of a training-data pipeline: lay the curated corpus out as N
  * equally-loaded shards in a pseudo-random but exactly replayable order
  * (the reference's pipelines stop at gold tables; a pretraining consumer
  * needs this materialization step on top).
  *
  * Design for 100 TB: there is deliberately NO global sort. Each row's
  * shard is a pure hash of its id (uniform by construction), so shard
  * assignment is embarrassingly parallel; the only shuffle is the
  * per-shard window that assigns in-shard positions and running token
  * offsets. With shard count sized to the cluster (thousands at 100 TB,
  * not this demo's 8) every window partition is bounded and the whole
  * layout is one hash-shuffle — the same cost as writing the output
  * partitioned by shard, which is what a real run does with it.
  *
  * Determinism: order inside a shard is `md5(seed|id)` with the id as
  * tie-break — no RNG, replayable across engines, which is what makes the
  * DuckDB oracle (x56) possible and makes training runs resumable: the
  * (shard, pos, tok_offset) triple never changes across re-executions.
  */
object Sharding {

  /** Assign every document a shard, a position inside the shard's
    * deterministic pseudo-random order, and the running token offset at
    * which it starts. `idCol` must be unique; `tokCol` is the document's
    * token count (any long-valued expression).
    */
  def shardLayout(docs: DataFrame, idCol: Column, tokCol: Column,
      nShards: Int, seed: String = "shuf"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val key = md5(concat(lit(seed + "|"), idCol.cast("string")))
    val keyed = docs.select(
      idCol.cast("long").as("doc_id"),
      tokCol.cast("long").as("n_tok"),
      key.as("__key"))
      .withColumn("shard",
        (conv(substring(col("__key"), 1, 8), 16, 10).cast("long") % nShards).cast("int"))
    val order = Window.partitionBy(col("shard")).orderBy(col("__key"), col("doc_id"))
    keyed
      .withColumn("pos", (row_number().over(order) - 1).cast("long"))
      .withColumn("tok_offset",
        coalesce(sum(col("n_tok")).over(
          order.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tok"), col("tok_offset"))
  }
}
