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

  /** Length-bucketed batch layout — the OTHER standard batching scheme
    * (complement of [[packSequences]]'s concat-and-chunk): documents are
    * padded, not concatenated, so each keeps its own attention span;
    * bucketing by length ladder keeps the padding loss bounded. Used for
    * SFT / evaluation batches where examples must not bleed into each
    * other.
    *
    * Each document is assigned the smallest rung of a fixed power-of-two
    * `ladder` that fits its token count (oversized docs take the top
    * rung — the trainer truncates them to it). Per rung the operator
    * reports the padded-batch economics for a `batchSize`-example batch:
    * documents, token mass, batch count, padded token slots
    * (batches · batchSize · rung) and the padding waste in per-mille of
    * slot capacity — the number a curation run watches to tune the
    * ladder. A FIXED ladder (not data-derived powers of two) keeps the
    * assignment a pure per-row expression: no aggregation or float
    * log2 on the assignment path, bit-identical across engines.
    *
    * Scale shape: one narrow projection (token count + rung CASE chain,
    * whole-stage codegen) and ONE map-side-combined aggregation on the
    * ~10-value rung key. No window, no sort, no skew pivot — the rung
    * histogram is the only shuffle and its cardinality is the ladder
    * length.
    */
  def lengthBuckets(docs: DataFrame, ladder: Seq[Long], batchSize: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(ladder.nonEmpty && ladder == ladder.sorted && ladder.distinct == ladder,
      "ladder must be a sorted list of distinct rung sizes")
    require(batchSize > 0, "batchSize must be positive")
    val tokens = size(filter(split(col(textCol), " "), w => length(w) > 0)).cast("long")
    val rung = ladder.init.reverse.foldLeft(lit(ladder.last)) { (acc, r) =>
      when(col("n_tokens") <= r, lit(r)).otherwise(acc)
    }
    docs.select(col(idCol), tokens.as("n_tokens"))
      .select(col(idCol), col("n_tokens"), rung.as("rung"))
      // tokens beyond the top rung are truncated to it — count the kept mass
      .withColumn("kept_tokens", least(col("n_tokens"), col("rung")))
      .groupBy(col("rung"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept_tokens")).as("sum_tokens"))
      .select(col("rung"), col("n_docs"), col("sum_tokens"),
        expr(s"(n_docs + ${batchSize - 1}L) div ${batchSize}L").as("n_batches"),
        expr(s"((n_docs + ${batchSize - 1}L) div ${batchSize}L) * ${batchSize}L * rung")
          .as("padded_slots"))
      .withColumn("waste_permille",
        expr("((padded_slots - sum_tokens) * 1000L) div padded_slots"))
  }
}
