package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** In-engine training of a linear quality classifier — the "fastText-style
  * filter" step of a pretraining pipeline (train a cheap model on labeled
  * docs, score the corpus, keep what clears the margin), done with batch
  * PERCEPTRON updates so every number is an exact integer and the whole
  * training run replays bit-for-bit in the DuckDB oracle:
  *
  *   margin_i  = y_i · (w · x_i)          (y ∈ {-1,+1}, x integer features)
  *   w_{k+1}   = w_k + Σ_{margin_i ≤ 0} y_i · x_i
  *
  * No learning rate, no floats, no RNG: the update is a SUM over the
  * misclassified set, so it is order-independent and partial-aggregates
  * map-side — each iteration is ONE corpus-linear pass whose shuffle
  * carries exactly one row of d+1 longs per map task. Weights travel into
  * the next iteration as plan literals (nothing is broadcast); the feature
  * projection is computed once and persisted (at 100 TB, either persist to
  * disk-backed storage or recompute — the projection is a codegen-only
  * map, so recomputation costs one scan, never a shuffle).
  *
  * Batch (not per-sample) perceptron converges on linearly-separable data
  * and otherwise cycles — which is fine: training is FIXED-ITERATION, and
  * the per-iteration error count the trainer emits is the curve a curation
  * run actually monitors.
  *
  * Reference anchor: the reference has no model-based curation (its gates
  * are constraint checks, 22_ETL_Silver_PySpark.py:32-58); this pairs with
  * LangModel.bigramFluency/dsirSelect as the trainable third member.
  */
object Classifier {

  /** Weights after each iteration plus the error count that produced the
    * update (misclassified under the PREVIOUS weights). */
  final case class IterStat(iter: Int, errors: Long, w0: Long, w1: Long,
      w2: Long, w3: Long, w4: Long)

  /** The fixed 5-feature integer projection: bias, chars, words, distinct
    * words, longest word. All derived from the text column alone so the
    * oracle needs no side tables. */
  def features(docs: DataFrame, label: Column,
      textCol: String = "text"): DataFrame = {
    val ws = filter(split(col(textCol), " "), w => length(w) > 0)
    docs.select(
      when(label, lit(1L)).otherwise(lit(-1L)).as("y"),
      lit(1L).as("f0"),
      length(col(textCol)).cast("long").as("f1"),
      size(ws).cast("long").as("f2"),
      size(array_distinct(ws)).cast("long").as("f3"),
      coalesce(array_max(transform(ws, w => length(w))), lit(0))
        .cast("long").as("f4"))
  }

  private val Dim = 5

  /** `iters` batch-perceptron iterations from w = 0. */
  def train(docs: DataFrame, label: Column, iters: Int,
      textCol: String = "text"): Seq[IterStat] = {
    require(iters > 0, "iters must be positive")
    val f = features(docs, label, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val w = Array.fill(Dim)(0L)
      val acc = ArrayBuffer.empty[IterStat]
      for (it <- 1 to iters) {
        val margin = col("y") *
          (0 until Dim).map(d => lit(w(d)) * col(s"f$d")).reduce(_ + _)
        val mis = when(margin <= 0, lit(1L)).otherwise(lit(0L))
        // coalesce like the weight deltas: on an empty (or fully
        // filtered) corpus sum() is NULL and getLong would NPE
        val aggs = coalesce(sum(mis), lit(0L)).as("errors") +:
          (0 until Dim).map(d =>
            coalesce(sum(when(margin <= 0, col("y") * col(s"f$d"))), lit(0L))
              .as(s"d$d"))
        val r = f.agg(aggs.head, aggs.tail: _*).head()
        val errors = r.getLong(0)
        for (d <- 0 until Dim) w(d) += r.getLong(d + 1)
        acc += IterStat(it, errors, w(0), w(1), w(2), w(3), w(4))
      }
      acc.toSeq
    } finally { f.unpersist(); () }
  }

  /** Training curve as a DataFrame: (iter, errors, w0..w4). */
  def trainTable(spark: SparkSession, stats: Seq[IterStat]): DataFrame = {
    import spark.implicits._
    stats.toDF()
  }

  /** Score every doc with a weight vector: (idCol, y, margin, correct).
    * One codegen projection — the corpus-filter deployment shape. */
  def scoreDocs(docs: DataFrame, label: Column, w: Seq[Long],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(w.length == Dim, s"expected $Dim weights")
    val ws = filter(split(col(textCol), " "), x => length(x) > 0)
    val feats = Seq[Column](
      lit(1L),
      length(col(textCol)).cast("long"),
      size(ws).cast("long"),
      size(array_distinct(ws)).cast("long"),
      coalesce(array_max(transform(ws, x => length(x))), lit(0)).cast("long"))
    val wx = feats.zip(w).map { case (fc, wd) => fc * lit(wd) }.reduce(_ + _)
    docs.select(
        col(idCol),
        when(label, lit(1L)).otherwise(lit(-1L)).as("y"),
        wx.as("wx"))
      .select(col(idCol), col("y"), (col("y") * col("wx")).as("margin"),
        (col("y") * col("wx") > 0).as("correct"))
  }

  /** Evaluate a weight vector on a labeled corpus: one row of confusion
    * counts plus precision/recall/F1 in exact integer micro-units (floor
    * division — the cross-engine convention of the whole scoring surface;
    * `pred positive` ⇔ w·x > 0). ONE corpus-linear partial-agg pass; the
    * metric arithmetic runs on the four aggregated longs. */
  def evaluate(docs: DataFrame, label: Column, w: Seq[Long],
      textCol: String = "text"): DataFrame = {
    require(w.length == Dim, s"expected $Dim weights")
    val ws = filter(split(col(textCol), " "), x => length(x) > 0)
    val feats = Seq[Column](
      lit(1L),
      length(col(textCol)).cast("long"),
      size(ws).cast("long"),
      size(array_distinct(ws)).cast("long"),
      coalesce(array_max(transform(ws, x => length(x))), lit(0)).cast("long"))
    val wx = feats.zip(w).map { case (fc, wd) => fc * lit(wd) }.reduce(_ + _)
    docs.select(
        when(label, lit(1L)).otherwise(lit(-1L)).as("y"), wx.as("wx"))
      .agg(
        // coalesced: an empty corpus evaluates to an all-zero confusion
        // row (micro-metrics 0), not a downstream null blowup
        coalesce(sum(when(col("y") === 1 && col("wx") > 0, 1L).otherwise(0L)), lit(0L)).as("tp"),
        coalesce(sum(when(col("y") === -1 && col("wx") > 0, 1L).otherwise(0L)), lit(0L)).as("fp"),
        coalesce(sum(when(col("y") === 1 && col("wx") <= 0, 1L).otherwise(0L)), lit(0L)).as("fn"),
        coalesce(sum(when(col("y") === -1 && col("wx") <= 0, 1L).otherwise(0L)), lit(0L)).as("tn"))
      // undefined ratios (empty denominator) report 0, in both engines —
      // a filter that predicts no positives has precision 0 by convention
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("CASE WHEN tp + fp = 0 THEN 0L ELSE (1000000 * tp) div (tp + fp) END")
          .as("precision_micro"),
        expr("CASE WHEN tp + fn = 0 THEN 0L ELSE (1000000 * tp) div (tp + fn) END")
          .as("recall_micro"))
      .select(col("*"),
        expr("CASE WHEN precision_micro + recall_micro = 0 THEN 0L ELSE " +
          "(2 * precision_micro * recall_micro) div (precision_micro + recall_micro) END")
          .as("f1_micro"))
  }

  /** Calibration curve (reliability diagram) of a trained filter: bucket
    * the raw model score w·x into `nBuckets` equal-width bins over the
    * corpus score range and report, per bin, how often the positive class
    * actually occurs — the audit that decides whether a score threshold
    * can be trusted as a keep/drop dial (a well-calibrated filter's
    * positive rate rises monotonically with the score; a memorizing one
    * is flat then vertical).
    *
    * All integer: bin = `((wx − min) · nBuckets) div (span + 1)` on the
    * broadcast corpus min/max (span+1 keeps the max score inside the last
    * bin and guards the degenerate one-score corpus), positive rate and
    * mean score in floor-division micro-units. Scale shape: ONE stats agg
    * (broadcast as a 1-row frame) + ONE map-side-combined aggregation on
    * the nBuckets-cardinality bin key — no sort, no window, no ntile
    * (an ntile decile would be a single-partition global sort).
    */
  def calibration(docs: DataFrame, label: Column, w: Seq[Long],
      nBuckets: Int = 10, textCol: String = "text"): DataFrame = {
    require(w.length == Dim, s"expected $Dim weights")
    require(nBuckets > 0, "nBuckets must be positive")
    val ws = filter(split(col(textCol), " "), x => length(x) > 0)
    val feats = Seq[Column](
      lit(1L),
      length(col(textCol)).cast("long"),
      size(ws).cast("long"),
      size(array_distinct(ws)).cast("long"),
      coalesce(array_max(transform(ws, x => length(x))), lit(0)).cast("long"))
    val wx = feats.zip(w).map { case (fc, wd) => fc * lit(wd) }.reduce(_ + _)
    val scored = docs.select(
      when(label, lit(1L)).otherwise(lit(0L)).as("pos"), wx.as("wx"))
    val range = scored.agg(min(col("wx")).as("lo"), max(col("wx")).as("hi"))
    scored.crossJoin(broadcast(range))
      .select(col("pos"), col("wx"),
        expr(s"((wx - lo) * $nBuckets) div (hi - lo + 1)").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        sum(col("wx")).as("sum_wx"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("(1000000 * n_pos) div n").as("pos_rate_micro"),
        expr("sum_wx div n").as("mean_wx"))
  }
}
