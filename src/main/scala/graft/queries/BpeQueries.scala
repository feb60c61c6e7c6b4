package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Bpe
import graft.sources.Tables.t

/** Tokenizer-training surface: distributed BPE merge learning (x75) and
  * the fertility audit of the learned tokenizer (x76). Both are exact —
  * learning is deterministic (total-order argmax per round), so the DuckDB
  * oracle re-learns the identical merge table with a mechanically
  * generated CTE chain (one pair-count + argmax + replace block per round)
  * and the driver hash-gates the result like any other query.
  */
object BpeQueries {

  /** Learning rounds for the oracle-gated queries: enough to produce
    * multi-character subword symbols on the testdata corpus while keeping
    * the generated oracle SQL readable. */
  val Rounds = 12

  // x75: learn the merge table itself.
  def x75BpeMerges(s: SparkSession, dir: String): DataFrame =
    Bpe.mergeTable(s, Bpe.learnMerges(t(s, dir, "documents"), Rounds))
      .orderBy(col("rank"))

  // x76: encode the corpus with the learned merges; per-doc fertility.
  def x76BpeEncode(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Bpe.subwordStats(docs, Bpe.learnMerges(docs, Rounds))
      .orderBy(col("doc_id"))
  }

  // x120: per-source tokenizer fertility — the corpus-mix view of x76's
  // per-doc audit: subwords-per-word in micro-units for every source. The
  // curation signal that says which corpora the learned tokenizer
  // compresses poorly (high fertility = more tokens per word = that
  // source burns training budget); every serious tokenizer report
  // publishes it per domain. Scale shape: x76's per-doc stats are already
  // corpus-linear; the rollup is one source-keyed map-side-combined agg —
  // a fertility of exactly 1e6 means every word stayed one token.
  def x120TokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Bpe.subwordStats(docs, Bpe.learnMerges(docs, Rounds))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"))
      .withColumn("fertility_micro",
        expr("(n_subwords * 1000000) div n_words"))
      .orderBy(col("source"))
  }

  // x121: x120's report as a CONTINUOUS process — the incremental-twin
  // pattern (x107/x109, x114/x118): the tokenizer is trained ONCE up
  // front (FROZEN merge table; retraining per batch would change what
  // the report measures), then each arriving batch pays only its own
  // subword encode plus a source-keyed rollup MERGEd into the running
  // (source, n_docs, n_words, n_subwords) accumulator. Per-source sums
  // are associative, so the accumulated report converges bit-for-bit to
  // x120's one-shot — they share fertilitySql. At 100 TB a batch costs
  // the batch: frozen merges ride the plan as literals, the replace
  // chain runs on the batch's distinct-word table, and the MERGE
  // touches a sources-sized accumulator.
  def x121IncrementalFertility(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val merges = Bpe.learnMerges(docs, Rounds) // frozen
    val batches = ExtensionQueries.thirdsByDocId(docs)
    val store = Scratch.store(s, "graft_x121")
    Scratch.sealing(store) {
      batches.foreach(b => fertilityIngestBatch(store, "fert.by_source", b, merges))
      store.read("fert.by_source")
        .withColumn("fertility_micro", expr("(n_subwords * 1000000) div n_words"))
        .select(col("source"), col("n_docs"), col("n_words"),
          col("n_subwords"), col("fertility_micro"))
        .orderBy(col("source"))
    }
  }

  /** One x121 ingest step: roll the batch up by source under the FROZEN
    * merge table and MERGE the sums into the accumulator — the per-batch
    * unit the Scale100 flat-cost profile measures. Batch cost = one
    * batch-sized encode + a sources-sized merge. */
  def fertilityIngestBatch(store: graft.tables.TableStore, table: String,
      batch: DataFrame, merges: Seq[Bpe.Merge]): Unit = {
    import graft.operators.MergeInto.{MatchedUpdate, NotMatchedInsert}
    import graft.core.Materialize.MatOps
    // materialized ONCE (localCheckpoint, sources-sized — a handful of
    // rows): the MERGE below otherwise re-evaluates its lazy source 3x
    // (candidate stats, discovery join, staged write), and every
    // evaluation here is a full batch subword-encode. localCheckpoint,
    // not persist — no cache-manager cost for a tiny RDD (see
    // TableStore.mergeInternal's r17 A/B note).
    val roll = Bpe.subwordStats(batch, merges)
      .join(batch.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"))
      .materialized
    if (!store.exists(table)) store.createOrReplace(table, roll)
    else store.merge(table, roll, Seq("source"),
      matched = Seq(MatchedUpdate(None, Map(
        "n_docs" -> (col("t.n_docs") + col("s.n_docs")),
        "n_words" -> (col("t.n_words") + col("s.n_words")),
        "n_subwords" -> (col("t.n_subwords") + col("s.n_subwords"))))),
      notMatched = Seq(NotMatchedInsert(None, Map(
        "source" -> col("s.source"), "n_docs" -> col("s.n_docs"),
        "n_words" -> col("s.n_words"), "n_subwords" -> col("s.n_subwords")))))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x75_bpe_merges" -> x75BpeMerges _,
    "x76_bpe_encode" -> x76BpeEncode _,
    "x120_tokenizer_fertility" -> x120TokenizerFertility _,
    "x121_incremental_fertility" -> x121IncrementalFertility _)

  /** CTE chain replaying BPE training in DuckDB: w0 = delimited
    * word-frequency table; per round k, pK = weighted adjacent-pair
    * counts, mK = argmax (count DESC, lhs, rhs), wK = the merge applied.
    * Mirrors Bpe.learnMerges exactly (same delimiter algebra, same greedy
    * left-to-right replace, same tie-break). wK LEFT JOINs its (0- or
    * 1-row) merge so that if merges exhaust before `rounds` (every word
    * fused to one symbol, mK empty) the word table survives unchanged —
    * matching the engine's early-stop — instead of going empty and
    * zeroing every later round's oracle. */
  private def bpeCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++=
      """w0 AS (
        |  SELECT w, regexp_replace(w, '(.)', '|\1|', 'g') AS s,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w)""".stripMargin
    for (k <- 1 to rounds) {
      sb ++= s""",
        |p$k AS (
        |  SELECT sym[i] AS lhs, sym[i + 1] AS rhs, CAST(sum(cnt) AS BIGINT) AS c
        |  FROM (SELECT sym, cnt, unnest(range(1, len(sym))) AS i
        |        FROM (SELECT string_split(substr(s, 2, length(s) - 2), '||') AS sym, cnt
        |              FROM w${k - 1}))
        |  GROUP BY 1, 2),
        |m$k AS (SELECT lhs, rhs, c FROM p$k ORDER BY c DESC, lhs, rhs LIMIT 1),
        |w$k AS (
        |  SELECT w, coalesce(replace(s, '|' || lhs || '||' || rhs || '|',
        |                             '|' || lhs || rhs || '|'), s) AS s, cnt
        |  FROM w${k - 1} LEFT JOIN m$k ON TRUE)""".stripMargin
    }
    sb.toString
  }

  private def mergesSql(rounds: Int): String = {
    val rows = (1 to rounds).map { k =>
      s"SELECT CAST($k AS INT) AS rank, lhs, rhs, lhs || rhs AS merged, c AS pair_count FROM m$k"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${bpeCtes(rounds)}
       |SELECT * FROM (
       |  $rows
       |) ORDER BY rank""".stripMargin
  }

  private def encodeSql(rounds: Int): String =
    s"""WITH ${bpeCtes(rounds)},
       |sub AS (
       |  SELECT w, CAST((length(s) - length(replace(s, '||', ''))) // 2 + 1 AS BIGINT) AS n_sub
       |  FROM w$rounds),
       |docw AS (
       |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS k
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY doc_id, w)
       |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_words,
       |       CAST(sum(k * n_sub) AS BIGINT) AS n_subwords
       |FROM docw JOIN sub USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private def fertilitySql(rounds: Int): String =
    s"""WITH ${bpeCtes(rounds)},
       |sub AS (
       |  SELECT w, CAST((length(s) - length(replace(s, '||', ''))) // 2 + 1 AS BIGINT) AS n_sub
       |  FROM w$rounds),
       |docw AS (
       |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS k
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY doc_id, w),
       |perdoc AS (
       |  SELECT doc_id, sum(k) AS nw, sum(k * n_sub) AS ns
       |  FROM docw JOIN sub USING (w) GROUP BY doc_id)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(nw) AS BIGINT) AS n_words,
       |       CAST(SUM(ns) AS BIGINT) AS n_subwords,
       |       CAST((SUM(ns) * 1000000) // SUM(nw) AS BIGINT) AS fertility_micro
       |FROM perdoc p JOIN documents d USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    "x75_bpe_merges" -> mergesSql(Rounds),
    "x76_bpe_encode" -> encodeSql(Rounds),
    "x120_tokenizer_fertility" -> fertilitySql(Rounds),
    // the incremental twin must converge bit-for-bit to the one-shot
    "x121_incremental_fertility" -> fertilitySql(Rounds))
}
