package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier
import graft.operators.Classifier.IterStat

/** Batch-perceptron semantics pinned against a hand-computed two-doc
  * corpus (zero-margin counts as misclassified; update = summed y·x over
  * the misclassified set), plus score/train consistency on real data. */
class ClassifierSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  // doc1: y=+1, f=[1,5,2,2,2]; doc2: y=-1, f=[1,2,1,1,2]
  private def tiny = Seq(
    (1L, "aa bb", "en"),
    (2L, "aa", "zh")).toDF("doc_id", "text", "lang")

  test("training replays the hand-computed weight trajectory") {
    val stats = Classifier.train(tiny, col("lang") === "en", iters = 3)
    assert(stats == Seq(
      // w=0: every margin is 0 → both misclassified
      IterStat(1, 2L, 0L, 3L, 1L, 1L, 0L),
      // doc1 margin 19 ok; doc2 margin -8 → w -= x2
      IterStat(2, 1L, -1L, 1L, 0L, 0L, -2L),
      // doc1 margin 0 → misclassified again; doc2 margin 3 ok
      IterStat(3, 1L, 0L, 6L, 2L, 2L, 0L)))
  }

  test("scoreDocs under w_{k-1} reproduces iteration k's error count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val label = col("lang") === "en"
    val stats = Classifier.train(docs, label, iters = 3)
    val w2 = stats(1) // weights after iteration 2
    val mis = Classifier.scoreDocs(docs, label,
        Seq(w2.w0, w2.w1, w2.w2, w2.w3, w2.w4))
      .filter(!col("correct")).count()
    assert(mis == stats(2).errors,
      "iteration 3's error count must equal the misclassified set under w_2")
  }

  test("evaluate: hand-computed confusion + floor-division metrics, zero-denominator guards") {
    val label = col("lang") === "en"
    // w = chars-only: doc1 wx=5 (tp), doc2 wx=2 (fp)
    val r = graft.operators.Classifier.evaluate(tiny, label, Seq(0L, 1L, 0L, 0L, 0L))
      .head()
    assert(r.toSeq == Seq(1L, 1L, 0L, 0L, 500000L, 1000000L, 666666L))
    // all-negative filter: no positives predicted → all ratios 0, no div-by-zero
    val z = graft.operators.Classifier.evaluate(tiny, label, Seq(-1L, 0L, 0L, 0L, 0L))
      .head()
    assert(z.toSeq == Seq(0L, 0L, 1L, 1L, 0L, 0L, 0L))
  }

  test("empty (or fully filtered) corpus: train and evaluate return zeros, not an NPE") {
    val empty = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    val stats = Classifier.train(empty, col("source") === "src0", iters = 2)
    assert(stats.map(_.errors) == Seq(0L, 0L))
    assert(stats.forall(s => Seq(s.w0, s.w1, s.w2, s.w3, s.w4).forall(_ == 0L)))
    val ev = Classifier.evaluate(empty, col("source") === "src0",
      Seq(1L, 0L, 0L, 0L, 0L)).head()
    assert((0 until 4).forall(i => ev.getLong(i) == 0L),
      "confusion counts on an empty corpus must be 0, not null")
  }

  test("empty-text docs carry [1, 0, 0, 0, 0] features (no null poisoning)") {
    val df = Seq((1L, "", "en"), (2L, " ", "zh")).toDF("doc_id", "text", "lang")
    val stats = Classifier.train(df, col("lang") === "en", iters = 1)
    // both margin 0 → misclassified; updates: +[1,0,0,0,0] + -[1,1,0,0,0]
    assert(stats == Seq(IterStat(1, 2L, 0L, -1L, 0L, 0L, 0L)))
  }

  test("uncertainty sample: the K selected docs dominate every unselected doc on |wx|") {
    val dir = "/root/testdata/sf0.001"
    val r = graft.queries.ClassifierQueries.x116UncertaintySample(spark, dir)
      .select($"doc_id", $"wx", $"abs_wx").as[(Long, Long, Long)].collect().toSeq
    assert(r.length == graft.queries.ClassifierQueries.UncertainK)
    assert(r.forall(t => math.abs(t._2) == t._3), "abs_wx must be |wx|")
    // every selected doc is at least as close to the boundary as every
    // unselected one (ties broken by doc_id, so compare (abs, id) order)
    val all = graft.queries.ClassifierQueries.x78PerceptronScore(spark, dir)
      .select($"doc_id", ($"y" * $"margin").as("wx"))
      .as[(Long, Long)].collect().toSeq
    val key = (t: (Long, Long)) => (math.abs(t._2), t._1)
    val worstSelected = r.map(t => (t._3, t._1)).max
    val bestUnselected = all.filterNot(d => r.exists(_._1 == d._1))
      .map(key).minOption
    import scala.math.Ordering.Implicits._
    assert(bestUnselected.forall(_ >= worstSelected),
      s"an unselected doc $bestUnselected beats a selected one $worstSelected")
  }
}
