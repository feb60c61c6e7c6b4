package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a curated corpus and a training
  * run: lay documents end-to-end and cut fixed-token-budget training
  * sequences ("packs"), so short documents don't waste context-window
  * padding. This is concat-and-chunk packing, the shape GPT-style
  * pretraining uses: the token stream is chunked every `budget` tokens
  * and a document may straddle a chunk boundary (the trainer truncates or
  * masks across it); no pack is ever under-filled except the last.
  *
  * Scale design: a single global concatenation order would serialize on
  * one cumsum, so documents are first bucketed by contiguous id range and
  * the stream restarts per bucket — each bucket packs independently
  * (packs never span buckets), so 1000 executors pack 1000 buckets with
  * one window sort each and zero coordination. All arithmetic is integer
  * and the order is total (id within bucket), so a SQL window oracle
  * reproduces the assignment bit-for-bit.
  */
object Packing {

  /** Assign each document its place in the packed token stream: for a
    * token `budget` per pack and `bucketRows` ids per bucket, returns one
    * row per document — (idCol, n_tokens, bucket, pack, pack_offset,
    * n_packs), where `pack` is the chunk holding the document's first
    * token, `pack_offset` that token's position within the chunk, and
    * `n_packs` how many chunks the document touches. `tokens` is any
    * integer token-count expression (plug in
    * [[graft.functions.TextFunctions.tokenCount]] or a real tokenizer
    * count column). */
  def packSequences(docs: DataFrame, tokens: Column, budget: Long,
      bucketRows: Long, idCol: String = "doc_id"): DataFrame = {
    require(budget > 0 && bucketRows > 0, "budget and bucketRows must be positive")
    val sized = docs.select(col(idCol), tokens.cast("long").as("n_tokens"),
      floor(col(idCol) / bucketRows).cast("long").as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized
      .withColumn("__end", sum(col("n_tokens")).over(w))
      .withColumn("__start", col("__end") - col("n_tokens"))
      .select(col(idCol), col("n_tokens"), col("bucket"),
        floor(col("__start") / budget).cast("long").as("pack"),
        (col("__start") % budget).as("pack_offset"),
        // an empty document occupies no tokens but still reports the pack
        // it would start in (n_packs = 0 marks it droppable)
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(floor((col("__end") - 1) / budget).cast("long") -
            floor(col("__start") / budget).cast("long") + 1L).as("n_packs"))
  }
}
