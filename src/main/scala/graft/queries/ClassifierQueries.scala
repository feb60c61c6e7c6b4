package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Classifier
import graft.sources.Tables.t

/** Model-based curation surface, trainable member: batch-perceptron
  * training of a linear quality/language classifier (x77) and its
  * corpus-scoring deployment (x78). Training is exact integer arithmetic
  * from w=0, so the DuckDB oracle re-RUNS the whole training loop (one
  * generated CTE block per iteration) and the driver hash-gates the
  * training curve and every per-doc margin. */
object ClassifierQueries {

  /** Fixed iteration count for the oracle-gated queries. */
  val Iters = 5

  private val label = col("lang") === "en"

  // x77: the training curve (iter, errors, w0..w4).
  def x77PerceptronTrain(s: SparkSession, dir: String): DataFrame =
    Classifier.trainTable(s,
        Classifier.train(t(s, dir, "documents"), label, Iters))
      .orderBy(col("iter"))

  // x78: score the corpus with the final weights.
  def x78PerceptronScore(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val w = Classifier.train(docs, label, Iters).last
    Classifier.scoreDocs(docs, label, Seq(w.w0, w.w1, w.w2, w.w3, w.w4))
      .orderBy(col("doc_id"))
  }

  // x82: confusion counts + integer-micro precision/recall/F1 of the
  // trained filter — the acceptance gate before a curation model ships.
  def x82ClassifierEval(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val w = Classifier.train(docs, label, Iters).last
    Classifier.evaluate(docs, label, Seq(w.w0, w.w1, w.w2, w.w3, w.w4))
  }

  // x91: calibration curve (reliability diagram) of the trained filter —
  // 10 equal-width score bins, per-bin positive rate and mean score in
  // integer micro-units. The audit that decides whether the score is a
  // trustworthy keep/drop dial.
  def x91Calibration(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val w = Classifier.train(docs, label, Iters).last
    Classifier.calibration(docs, label, Seq(w.w0, w.w1, w.w2, w.w3, w.w4),
        nBuckets = 10)
      .orderBy(col("bin"))
  }

  /** Selection size for the oracle-gated uncertainty sample. */
  val UncertainK = 20

  // x116: active-learning uncertainty sampling — the "what to label next"
  // step: the K docs whose raw classifier score |w·x| sits closest to the
  // decision boundary, where a human label buys the most information
  // (margin-based uncertainty, the classic active-learning heuristic).
  // Scale shape: one corpus-linear scoring projection into a
  // TakeOrderedAndProject cut (per-partition top-K, K-row merge on the
  // driver) — no global sort, no window; the 100 TB cost is the scan x78
  // already pays.
  def x116UncertaintySample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val w = Classifier.train(docs, label, Iters).last
    Classifier.scoreDocs(docs, label, Seq(w.w0, w.w1, w.w2, w.w3, w.w4))
      .select(col("doc_id"), (col("y") * col("margin")).as("wx"))
      .withColumn("abs_wx", abs(col("wx")))
      .orderBy(col("abs_wx"), col("doc_id"))
      .limit(UncertainK)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x77_perceptron_train" -> x77PerceptronTrain _,
    "x78_perceptron_score" -> x78PerceptronScore _,
    "x82_classifier_eval" -> x82ClassifierEval _,
    "x91_calibration" -> x91Calibration _,
    "x116_uncertainty_sample" -> x116UncertaintySample _)

  /** Feature CTE shared by both oracles — the SQL twin of
    * [[Classifier.features]] (plus doc_id for the scoring join). */
  private val FeatCte =
    """f AS (
      |  SELECT doc_id,
      |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
      |    CAST(1 AS BIGINT) AS f0,
      |    CAST(length(text) AS BIGINT) AS f1,
      |    CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 0)) AS BIGINT) AS f2,
      |    CAST(len(list_distinct(list_filter(string_split(text, ' '), w -> length(w) > 0))) AS BIGINT) AS f3,
      |    CAST(coalesce(list_max(list_transform(list_filter(string_split(text, ' '), w -> length(w) > 0), w -> length(w))), 0) AS BIGINT) AS f4
      |  FROM documents),
      |i0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
      |              CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3,
      |              CAST(0 AS BIGINT) AS w4)""".stripMargin

  /** One update + apply block per iteration: uK aggregates the error count
    * and the summed misclassified updates under the PREVIOUS weights; iK
    * is the post-update weight row. */
  private def iterCtes(iters: Int): String = {
    val sb = new StringBuilder(FeatCte)
    for (k <- 1 to iters) {
      val ds = (0 until 5).map(d =>
        s"CAST(coalesce(sum(CASE WHEN m <= 0 THEN y * f$d END), 0) AS BIGINT) AS d$d")
        .mkString(",\n        ")
      sb ++= s""",
        |u$k AS (
        |  SELECT CAST(sum(CASE WHEN m <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS errors,
        |        $ds
        |  FROM (SELECT f.*, y * (w0*f0 + w1*f1 + w2*f2 + w3*f3 + w4*f4) AS m
        |        FROM f, i${k - 1})),
        |i$k AS (SELECT w0 + d0 AS w0, w1 + d1 AS w1, w2 + d2 AS w2,
        |               w3 + d3 AS w3, w4 + d4 AS w4 FROM i${k - 1}, u$k)""".stripMargin
    }
    sb.toString
  }

  private def trainSql(iters: Int): String = {
    val rows = (1 to iters).map { k =>
      s"SELECT CAST($k AS INT) AS iter, errors, w0, w1, w2, w3, w4 FROM u$k, i$k"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${iterCtes(iters)}
       |SELECT * FROM (
       |  $rows
       |) ORDER BY iter""".stripMargin
  }

  private def scoreSql(iters: Int): String =
    s"""WITH ${iterCtes(iters)}
       |SELECT doc_id, y,
       |       y * (w0*f0 + w1*f1 + w2*f2 + w3*f3 + w4*f4) AS margin,
       |       y * (w0*f0 + w1*f1 + w2*f2 + w3*f3 + w4*f4) > 0 AS correct
       |FROM f, i$iters ORDER BY doc_id""".stripMargin

  private def evalSql(iters: Int): String =
    s"""WITH ${iterCtes(iters)},
       |scored AS (
       |  SELECT y, w0*f0 + w1*f1 + w2*f2 + w3*f3 + w4*f4 AS wx FROM f, i$iters),
       |conf AS (
       |  SELECT CAST(sum(CASE WHEN y = 1 AND wx > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |         CAST(sum(CASE WHEN y = -1 AND wx > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |         CAST(sum(CASE WHEN y = 1 AND wx <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |         CAST(sum(CASE WHEN y = -1 AND wx <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM scored),
       |pr AS (
       |  SELECT tp, fp, fn, tn,
       |         CAST(CASE WHEN tp + fp = 0 THEN 0
       |              ELSE (1000000 * tp) // (tp + fp) END AS BIGINT) AS precision_micro,
       |         CAST(CASE WHEN tp + fn = 0 THEN 0
       |              ELSE (1000000 * tp) // (tp + fn) END AS BIGINT) AS recall_micro
       |  FROM conf)
       |SELECT tp, fp, fn, tn, precision_micro, recall_micro,
       |       CAST(CASE WHEN precision_micro + recall_micro = 0 THEN 0
       |            ELSE (2 * precision_micro * recall_micro)
       |                 // (precision_micro + recall_micro) END AS BIGINT) AS f1_micro
       |FROM pr""".stripMargin

  private def calibSql(iters: Int, nBuckets: Int): String =
    s"""WITH ${iterCtes(iters)},
       |scored AS (
       |  SELECT CASE WHEN y = 1 THEN 1 ELSE 0 END AS pos,
       |         w0*f0 + w1*f1 + w2*f2 + w3*f3 + w4*f4 AS wx
       |  FROM f, i$iters),
       |rng AS (SELECT MIN(wx) AS lo, MAX(wx) AS hi FROM scored),
       |binned AS (
       |  SELECT pos, wx, ((wx - lo) * $nBuckets) // (hi - lo + 1) AS bin
       |  FROM scored, rng),
       |agg AS (
       |  SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n,
       |         CAST(SUM(pos) AS BIGINT) AS n_pos,
       |         CAST(SUM(wx) AS BIGINT) AS sum_wx
       |  FROM binned GROUP BY bin)
       |SELECT bin, n, n_pos,
       |  CAST((1000000 * n_pos) // n AS BIGINT) AS pos_rate_micro,
       |  CAST(sum_wx // n AS BIGINT) AS mean_wx
       |FROM agg ORDER BY bin""".stripMargin

  private def uncertainSql(iters: Int, k: Int): String =
    s"""WITH ${iterCtes(iters)},
       |scored AS (
       |  SELECT doc_id, w0*f0 + w1*f1 + w2*f2 + w3*f3 + w4*f4 AS wx
       |  FROM f, i$iters)
       |SELECT doc_id, CAST(wx AS BIGINT) AS wx, CAST(abs(wx) AS BIGINT) AS abs_wx
       |FROM scored ORDER BY abs(wx), doc_id LIMIT $k""".stripMargin

  val oracles: Map[String, String] = Map(
    "x77_perceptron_train" -> trainSql(Iters),
    "x78_perceptron_score" -> scoreSql(Iters),
    "x82_classifier_eval" -> evalSql(Iters),
    "x91_calibration" -> calibSql(Iters, nBuckets = 10),
    "x116_uncertainty_sample" -> uncertainSql(Iters, UncertainK))
}
