package graft

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Bpe

/** ScalaCheck property: the distributed BPE (delimiter-string replace
  * algebra) must equal a sequential driver-side reference implementation
  * (explicit symbol lists, explicit greedy left-to-right merge scan) on
  * ARBITRARY small corpora — pair counting, (count DESC, lhs, rhs)
  * tie-breaks, non-overlapping merge application, early exhaustion, and
  * the fertility encode, bit-for-bit. */
class BpePropertySpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  private def run(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // words over a 2-letter alphabet, so pair collisions and ties are common
  private val wordGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 4)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
  } yield cs.mkString

  private val corpusGen: Gen[List[String]] =
    Gen.listOfN(4, for {
      n <- Gen.chooseNum(2, 8)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" "))

  /** Greedy left-to-right non-overlapping merge of one pair. */
  private def applyMerge(sym: List[String], l: String, r: String): List[String] = {
    val out = ListBuffer.empty[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.toList
  }

  /** Sequential reference learner over the word-frequency table. */
  private def refLearn(corpus: List[String], rounds: Int): List[Bpe.Merge] = {
    val wf = corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
      .filter(_.matches("^[a-z]+$"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var words: List[(List[String], Long)] =
      wf.toList.map { case (w, c) => (w.toList.map(_.toString), c) }
    val acc = ListBuffer.empty[Bpe.Merge]
    var k = 0
    var done = false
    while (k < rounds && !done) {
      val pairs = words.flatMap { case (sym, c) =>
        sym.zip(sym.drop(1)).map(p => (p, c))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), c) = pairs.toList
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        k += 1
        acc += Bpe.Merge(k, l, r, l + r, c)
        words = words.map { case (sym, cnt) => (applyMerge(sym, l, r), cnt) }
      }
    }
    acc.toList
  }

  /** Reference encode: apply the merge table in rank order to a word. */
  private def refEncode(w: String, merges: Seq[Bpe.Merge]): List[String] =
    merges.sortBy(_.rank).foldLeft(w.toList.map(_.toString)) { (sym, m) =>
      applyMerge(sym, m.lhs, m.rhs)
    }

  test("learnMerges equals the sequential reference on arbitrary corpora") {
    val prop = Prop.forAll(corpusGen) { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      Bpe.learnMerges(docs, rounds = 5) == refLearn(corpus, rounds = 5)
    }
    run(prop)
  }

  test("subwordStats equals the sequential reference encode") {
    val prop = Prop.forAll(corpusGen) { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val merges = refLearn(corpus, rounds = 3)
      val got = Bpe.subwordStats(docs, merges)
        .select($"doc_id".as[Long], $"n_words".as[Long], $"n_subwords".as[Long])
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      val want = corpus.zipWithIndex.flatMap { case (t, i) =>
        val ws = t.split(" ").filter(_.nonEmpty).filter(_.matches("^[a-z]+$"))
        if (ws.isEmpty) None
        else Some(i.toLong ->
          (ws.length.toLong, ws.map(w => refEncode(w, merges).length.toLong).sum))
      }.toMap
      got == want
    }
    run(prop)
  }
}
