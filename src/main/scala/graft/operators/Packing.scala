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
  /** Encode each document as its ordered sequence of vocabulary token ids
    * — the tokenize-to-ids step that feeds [[packSequences]] (which lays
    * out counts; this produces the ids a trainer actually reads).
    *
    * The vocabulary is the corpus's `vocabSize` most frequent whitespace
    * tokens (count desc, token asc — a total order, so the cut is
    * deterministic), id 1..vocabSize by that rank; everything else maps to
    * the UNK id 0. Output is one row per document: (idCol, n_tokens,
    * ids) with `ids` the space-joined id sequence in token order — a
    * string, not an array, so exact cross-engine compares stay trivially
    * sortable.
    *
    * Scale shape: the count agg is one map-side-combined shuffle;
    * top-vocabSize selection is TakeOrderedAndProject (no global sort
    * materialization — vocabSize is a constant, independent of corpus
    * size); the id join broadcasts the vocabulary; per-doc assembly is a
    * row-local collect_list + array_sort (bounded by document length),
    * so no window over the corpus and no skew pivot. */
  def encodeTokenIds(docs: DataFrame, vocabSize: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val toks = docs.select(col(idCol),
      posexplode(filter(split(col(textCol), " "), w => length(w) > 0)).as(Seq("pos", "w")))
    // rank over the already-LIMITed vocabSize rows: the single-partition
    // window touches a constant number of rows, never the corpus
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(vocabSize)
      .select(col("w"),
        row_number().over(Window.orderBy(col("cnt").desc, col("w"))).as("id"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .select(col(idCol), col("pos"), coalesce(col("id"), lit(0)).as("id"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("id")))),
            s => s.getField("id").cast("string")),
          " ").as("ids"))
  }

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
