package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Materialize.MatOps

/** Distributed byte-pair-encoding tokenizer TRAINING (Sennrich et al.
  * 2016) — the step a pretraining pipeline runs before it can tokenize
  * anything: learn the merge table itself from corpus statistics.
  *
  * The classic BPE trick makes this tractable at corpus scale: merges are
  * a function of the WORD-FREQUENCY table, not the corpus. The corpus is
  * touched exactly once (token explode → `groupBy(word).count`, one
  * map-side-combined shuffle); every learning round after that runs over
  * the vocabulary-sized table — at 100 TB of text the distinct-word table
  * is millions of rows, not billions of tokens, and it is persisted once
  * and re-derived per round from a replace chain bounded at [[Segment]]
  * merges — every Segment accepted merges the current forms are
  * re-materialized (localCheckpoint, vocabulary-sized) so lineage and
  * expression depth never compound past the segment size.
  *
  * Representation: a word's current symbol segmentation is a
  * delimiter-wrapped string — "low" → `"|l||o||w|"`, every symbol wrapped
  * in its own `|…|`. Merging the pair (l,o) is then the codegen'd built-in
  * `replace(s, "|l||o|", "|lo|")`: because each symbol carries BOTH its
  * delimiters, a pattern can never match across a symbol boundary or
  * half-consume a neighbouring pair, and left-to-right non-overlapping
  * `replace` semantics are exactly BPE's greedy merge order (`"|a||a||a|"`
  * → `"|aa||a|"`). Training is restricted to `^[a-z]+$` word forms so the
  * delimiter can never collide with corpus bytes.
  *
  * Each round is: symbols from the delimited form (one `split`), adjacent
  * pairs (one bounded `transform`+`explode`), weighted pair counts (partial
  * agg before the exchange), argmax by (count DESC, lhs, rhs) — a total
  * order, so learning is deterministic and the DuckDB oracle replays the
  * merge table bit-for-bit. The argmax is `TakeOrderedAndProject(limit=1)`:
  * the only driver-side data is one row per round.
  *
  * Reference anchor: the reference pipeline ships text to an external
  * tokenizer; this closes the loop in-engine, the same way the dedup
  * family extends its curation surface (22_ETL_Silver_PySpark.py:32-58 has
  * only constraint gates).
  */
object Bpe {

  /** Trained-on word shape — lowercase alpha only, so the `|` delimiter is
    * provably absent from every symbol. */
  val WordRe = "^[a-z]+$"

  /** One learned merge: at `rank`, the adjacent pair (lhs, rhs) had the
    * highest weighted frequency `pairCount` and became symbol `merged`. */
  final case class Merge(rank: Int, lhs: String, rhs: String,
      merged: String, pairCount: Long)

  /** (w, cnt): corpus word-frequency table over `^[a-z]+$` whitespace
    * tokens — the single corpus-sized pass of BPE training. */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w").rlike(WordRe))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** "low" → "|l||o||w|" — every character wrapped in its own delimiters. */
  def delimited(c: Column): Column = regexp_replace(c, "(.)", "|$1|")

  /** Apply a learned merge table (in rank order) to a delimited-form
    * column — a chain of codegen'd `replace` calls, one per merge.
    *
    * SCALE BOUND: callers must never hand this more than [[Segment]]
    * merges in one projection — a 32k-merge production vocabulary chained
    * into a single expression exceeds the JVM/codegen method-size limit
    * and silently degrades to interpreted per-row eval. Use
    * [[applyMergesBounded]] for full merge tables; this raw form exists
    * for the per-round re-derivation (whose chain is already ≤ Segment)
    * and for tests. */
  def applyMerges(s: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(s) { (acc, m) =>
      replace(acc, lit(s"|${m.lhs}||${m.rhs}|"), lit(s"|${m.merged}|"))
    }

  /** Merges applied per materialized projection segment. Empirically a
    * 128-replace chain stays comfortably inside whole-stage codegen
    * (BpeSpec asserts it); the per-segment localCheckpoint between chains
    * truncates lineage so a 32k-merge vocabulary is 32k/128 ≈ 250
    * vocabulary-sized materializations, never one 32k-deep expression. */
  val Segment = 128

  /** Apply a full learned merge table to the delimited-form column `sCol`
    * of `df`, re-materializing (localCheckpoint, vocabulary-sized) every
    * `segment` merges so no single projection carries more than `segment`
    * chained replaces and no logical plan compounds across segments. */
  def applyMergesBounded(df: DataFrame, sCol: String, merges: Seq[Merge],
      segment: Int = Segment): DataFrame = {
    val sorted = merges.sortBy(_.rank)
    if (sorted.length <= segment)
      df.withColumn(sCol, applyMerges(col(sCol), sorted))
    else {
      val groups = sorted.grouped(segment).toSeq
      groups.zipWithIndex.foldLeft(df) { case (acc, (seg, i)) =>
        val next = acc.withColumn(sCol, applyMerges(col(sCol), seg))
        // the last segment stays lazy: downstream ops fuse into its plan
        if (i < groups.length - 1) {
          val m = next.materialized
          // the predecessor checkpoint is dead the moment its successor
          // materializes — release it (never the caller's input frame)
          if (acc ne df) org.apache.spark.sql.GraftShims.unpersistCheckpoint(acc, deleteFiles = true)
          m
        } else next
      }
    }
  }

  /** One learning round's argmax plan over a (s, cnt) word table —
    * exposed so the plan audit can pin its shape (partial agg before the
    * exchange, TakeOrderedAndProject(1) instead of a global sort). */
  def topPairPlan(cur: DataFrame): DataFrame =
    pairCounts(cur).orderBy(col("c").desc, col("lhs"), col("rhs")).limit(1)

  /** Adjacent symbol pairs of the delimited form `s`, weighted by `cnt`,
    * aggregated to ((lhs, rhs) → total count). */
  private def pairCounts(cur: DataFrame): DataFrame =
    cur.select(col("cnt"),
        split(expr("substring(s, 2, length(s) - 2)"), "\\|\\|").as("sym"))
      .filter(size(col("sym")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(0, size(sym) - 2), i -> struct(sym[i] AS lhs, sym[i + 1] AS rhs))"))
        .as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("c"))

  /** Learn up to `rounds` merges from the corpus. Stops early only if no
    * adjacent pair remains (every word fused to one symbol).
    *
    * `batch` = merges accepted per counting pass. 1 (default) is EXACT
    * BPE — recount between every merge — and what the x75 oracle replays.
    * batch > 1 is the standard parallel-BPE approximation for production
    * vocabularies (a 32k-merge table cannot run 32k Spark jobs): after one
    * counting pass, accept the top pairs in (count DESC, lhs, rhs) order,
    * greedily skipping any pair that shares a symbol with — or whose side
    * EQUALS the fused symbol of — an already-accepted pair of the same
    * pass, so the accepted merges touch disjoint symbols and their chained
    * application is order-independent within the pass. Determinism is
    * unchanged; only the count-refresh granularity coarsens. */
  def learnMerges(docs: DataFrame, rounds: Int,
      textCol: String = "text", batch: Int = 1): Seq[Merge] = {
    require(rounds > 0, "rounds must be positive")
    require(batch > 0, "batch must be positive")
    val base = wordFreq(docs, textCol)
      .select(delimited(col("w")).as("s"), col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val acc = ArrayBuffer.empty[Merge]
      // `mat` holds the word forms with the first `matCount` merges already
      // applied AND materialized (localCheckpoint every Segment accepted
      // merges) — each round re-derives through a replace chain of at most
      // Segment merges, so a 32k-round run never builds a 32k-deep
      // expression or a compounding logical plan.
      var mat: DataFrame = base
      var matCount = 0
      var exhausted = false
      while (acc.length < rounds && !exhausted) {
        if (acc.length - matCount >= Segment) {
          val next = mat.select(
            applyMerges(col("s"), acc.drop(matCount).toSeq).as("s"), col("cnt"))
            .materialized
          // release the superseded materialization (never the persisted
          // base): a 32k-merge run would otherwise pin rounds/Segment
          // dead copies of the vocab table in executor storage
          if (mat ne base)
            org.apache.spark.sql.GraftShims.unpersistCheckpoint(mat, deleteFiles = true)
          mat = next
          matCount = acc.length
        }
        // re-derive from the latest materialized form through the bounded
        // replace chain: plan depth ≤ Segment, lineage never compounds
        val cur = mat.select(
          applyMerges(col("s"), acc.drop(matCount).toSeq).as("s"), col("cnt"))
        val want = (rounds - acc.length).min(batch)
        // over-fetch: some candidates are rejected for symbol conflicts
        val top = pairCounts(cur)
          .orderBy(col("c").desc, col("lhs"), col("rhs"))
          .limit(if (batch == 1) 1 else 4 * batch).collect()
        if (top.isEmpty) exhausted = true
        else {
          val used = scala.collection.mutable.Set.empty[String]
          var taken = 0
          for (r <- top if taken < want) {
            val (l, rr) = (r.getString(0), r.getString(1))
            if (!used(l) && !used(rr) && !used(l + rr)) {
              used ++= Seq(l, rr, l + rr)
              acc += Merge(acc.length + 1, l, rr, l + rr, r.getLong(2))
              taken += 1
            }
          }
          // the first candidate always passes (nothing `used` yet), so
          // every non-empty pass advances — no livelock possible
        }
      }
      // the merge table (plain data) is the result — the last
      // materialization is dead too
      if (mat ne base)
        org.apache.spark.sql.GraftShims.unpersistCheckpoint(mat, deleteFiles = true)
      acc.toSeq
    } finally { base.unpersist(); () }
  }

  /** The learned merge table as a DataFrame:
    * (rank, lhs, rhs, merged, pair_count). */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Encode every document with a learned merge table and report
    * (idCol, n_words, n_subwords) — the "tokenizer fertility" audit
    * (subwords per word) run before committing to a vocabulary.
    *
    * Scale shape: per-(doc, word) counts are one corpus shuffle; the
    * replace chain runs on the DISTINCT word table only (vocabulary-sized,
    * each word encoded once no matter how often it occurs); the encode
    * join is equi-keyed on the word. Docs with no `^[a-z]+$` words carry
    * no rows. Merges ride the plan as literals — nothing is broadcast or
    * collected.
    */
  def subwordStats(docs: DataFrame, merges: Seq[Merge],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // NOT fanned out: r17 A/B'd the §2.5 repartition-after-read here and
    // the BPE family got slower (x120 +1.0, x121 +0.9, x75/x76 +0.1 s) —
    // the map-side combine off the scan beats the extra exchange
    val words = docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w").rlike(WordRe))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("k"))
    val forms = applyMergesBounded(
        words.select(col("w")).distinct()
          .select(col("w"), delimited(col("w")).as("s")),
        "s", merges)
      // |a||b||c| has n-1 inner "||" seams: symbols = seams + 1
      .select(col("w"), expr(
        "(length(s) - length(replace(s, '||', ''))) div 2 + 1").as("n_sub"))
    words.join(forms, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_words"),
        sum(col("k") * col("n_sub")).as("n_subwords"))
  }
}
