package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical language-model scoring for corpus curation — the two
  * model-based selection steps a pretraining pipeline runs after the
  * rule-based filters (TextFunctions) and before dedup/mixing:
  *
  *  - [[bigramFluency]]: CCNet-style fluency scoring (Wenzek et al. 2020)
  *    with a bigram LM trained on a trusted reference slice. CCNet ranks
  *    Common-Crawl docs by the perplexity of a Wikipedia-trained LM; here
  *    the LM is a Laplace-smoothed bigram model trained on a designated
  *    source slice of the same corpus, and the score is the mean smoothed
  *    bigram probability in BIGINT micro-units (floor division), so the
  *    ranking is bit-exact cross-engine — no logs, no floats.
  *  - [[dsirSelect]]: Data Selection via Importance Resampling (Xie et al.
  *    2023). DSIR estimates target/raw importance weights on hashed n-gram
  *    features and keeps docs whose weight clears a threshold. Features are
  *    md5-hashed token buckets (deterministic, engine-agnostic); the weight
  *    is the mean per-token probability ratio between the target-slice
  *    unigram model and the whole-corpus model, in exact integer
  *    micro-units (DECIMAL(38,0) intermediates — the cross-engine twin of
  *    DuckDB HUGEINT).
  *
  * Scale shape (100 TB): both models are aggregates over one token-explode
  * pass — a single shuffle each. The DSIR bucket table is `buckets` rows
  * (constant) and broadcasts to the scoring join; the bigram model is
  * corpus-vocabulary-sized and shuffle-joins on the bigram key. Selection
  * is a per-row threshold — no global sort, no driver collect. In
  * production the reference slice is a fixed sample, so the trained model
  * is write-once and reusable across corpus batches.
  *
  * Reference anchor: the reference pipeline has no model-based curation
  * stage (its quality gates are constraint checks,
  * 22_ETL_Silver_PySpark.py:32-58); these extend the documents surface the
  * same way the dedup family does.
  */
object LangModel {

  /** Whitespace tokens with empties dropped — the shared tokenizer of the
    * text-quality surface (matches x50's `length(w) > 0` convention). */
  private def tokens(text: Column): Column =
    filter(split(text, " "), w => length(w) > 0)

  /** CCNet-style bigram-LM fluency score for every document.
    *
    * Trains a Laplace-smoothed bigram model on `docs` rows matching
    * `trainPred` (the trusted slice), then scores EVERY doc (including the
    * training slice, as CCNet does) by the mean smoothed conditional
    * probability of its bigrams:
    *
    *   p_micro(w1,w2) = (1_000_000 * (c(w1,w2) + 1)) div (c(w1) + V)
    *   fluency_micro(doc) = sum(p_micro) div n_bigrams
    *
    * where c(·) are training-slice counts and V the training vocabulary.
    * Higher = more fluent under the reference model. Docs with fewer than
    * two tokens have no bigrams and are omitted (none exist in the
    * testdata; the guard keeps the sequence() bounds total).
    *
    * Output: (doc_id, n_bigrams, fluency_micro).
    */
  def bigramFluency(docs: DataFrame, trainPred: Column): DataFrame = {
    // fanOut before the tokenize + bigram explode (§2.5): a low-split
    // scan otherwise runs the corpus-sized pass in one task
    val toks = graft.sources.Tables.fanOut(docs, col("doc_id"))
      .select(col("doc_id"), trainPred.as("is_train"), tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
    val bigrams = toks.select(col("doc_id"), col("is_train"),
        explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
          .as("b"))
      .select(col("doc_id"), col("is_train"), col("b.w1"), col("b.w2"))
    val c12 = bigrams.filter(col("is_train"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    // c(w1) as bigram-left marginal: derived from c12, one extra (small) agg.
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = toks.filter(col("is_train"))
      .select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    bigrams
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        ((coalesce(col("c12"), lit(0L)) + lit(1L)) * lit(1000000L)).as("num"),
        (coalesce(col("c1"), lit(0L)) + col("v")).as("den"))
      .select(col("doc_id"), expr("num div den").as("p_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(p_micro) div count(1)").as("fluency_micro"))
  }

  /** DSIR importance-weighted selection (Xie et al. 2023, simplified to
    * unigram features as the paper's hashed-n-gram special case n=1).
    *
    * Tokens hash into `buckets` md5-derived buckets. With target counts
    * ct(b) over `targetPred` rows, raw counts cq(b) over the whole corpus,
    * and totals Nt/Nq, the per-bucket importance ratio is the smoothed
    * probability ratio in micro-units:
    *
    *   r_micro(b) = (1e6 * (ct+1) * (Nq+B)) div ((cq+1) * (Nt+B))
    *
    * computed in DECIMAL(38,0) (products reach ~1e2x at corpus scale; the
    * DuckDB oracle mirrors with HUGEINT). A doc's weight is the mean
    * r_micro of its tokens; `selected` marks weights strictly above the
    * corpus-mean weight (one exact integer scalar aggregate, broadcast back
    * — no global sort) — the deterministic analogue of the paper's
    * sampling gate: keep what looks more target-like than the average doc.
    *
    * Output: (doc_id, n_tokens, dsir_micro, selected).
    */
  def dsirSelect(docs: DataFrame, targetPred: Column, buckets: Int = 256): DataFrame = {
    // fanOut before the token explode + md5 bucketing (§2.5, see
    // bigramFluency)
    val tok = graft.sources.Tables.fanOut(docs, col("doc_id"))
      .select(col("doc_id"), targetPred.as("is_tgt"),
        explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"), col("is_tgt"),
        (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long") % buckets).as("b"))
    val ct = tok.filter(col("is_tgt")).groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val cq = tok.groupBy(col("b")).agg(count(lit(1)).as("cq"))
    val tot = tok.agg(
      sum(when(col("is_tgt"), lit(1L)).otherwise(lit(0L))).as("nt"),
      count(lit(1)).as("nq"))
    val dec = "decimal(38,0)"
    val ratio = cq.join(ct, Seq("b"), "left").crossJoin(broadcast(tot))
      .select(col("b"),
        (lit(1000000L).cast(dec)
          * (coalesce(col("ct"), lit(0L)) + lit(1L)).cast(dec)
          * (col("nq") + lit(buckets.toLong)).cast(dec)).as("num"),
        ((col("cq") + lit(1L)).cast(dec)
          * (col("nt") + lit(buckets.toLong)).cast(dec)).as("den"))
      .select(col("b"), expr("CAST(num div den AS BIGINT)").as("r_micro"))
    val scored = tok.join(broadcast(ratio), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        expr(s"CAST(sum(CAST(r_micro AS $dec)) div count(1) AS BIGINT)")
          .as("dsir_micro"))
    val thr = scored.agg(
      expr(s"CAST(sum(CAST(dsir_micro AS $dec)) div count(1) AS BIGINT)").as("thr"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_tokens"), col("dsir_micro"),
        (col("dsir_micro") > col("thr")).cast("int").as("selected"))
  }
}
