package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.{Packing, Retrieval}

/** ScalaCheck properties for the round-5 pipeline operators: sequence
  * packing must tile the per-bucket token stream exactly for ARBITRARY
  * token-count distributions (including zeros and budget-crossers), and
  * BM25 retrieval must rank by a driver-side reference scorer for
  * ARBITRARY small corpora — the distributed micro-unit sum has to equal
  * the sequential reference fold bit-for-bit. */
class PipelineOpsPropertySpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  private def run(prop: Prop, sizeHint: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(sizeHint), prop)
    assert(res.passed, res.status.toString)
  }

  test("packing tiles every bucket exactly for arbitrary token counts") {
    val rowsGen = Gen.listOfN(60, Gen.chooseNum(0L, 700L))
    val prop = Prop.forAll(rowsGen) { toks =>
      val docs = toks.zipWithIndex
        .map { case (n, id) => (id.toLong, n) }.toDF("doc_id", "n")
      val out = Packing.packSequences(docs, col("n"), budget = 256L, bucketRows = 16L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .sortBy(_._1)
      // reference: sequential concat per bucket
      val byBucket = out.groupBy(_._3).values.map(_.sortBy(_._1))
      byBucket.forall { rows =>
        var cum = 0L
        rows.forall { case (_, n, _, pack, off, nPacks) =>
          val ok = pack == cum / 256 && off == cum % 256 &&
            nPacks == (if (n == 0) 0L else (cum + n - 1) / 256 - cum / 256 + 1)
          cum += n
          ok
        }
      }
    }
    run(prop)
  }

  test("bm25 equals a sequential reference scorer for arbitrary corpora") {
    val vocab = Seq("ant", "bee", "cat", "dog", "elk")
    val docGen = Gen.listOfN(8, Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" "))))
    val prop = Prop.forAll(docGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val queries = Seq(0 -> Seq("ant", "cat"), 1 -> Seq("dog"))
      val got = Retrieval.bm25TopK(docs, queries, k = 8)
        .select($"query_id", $"doc_id", $"score_micro")
        .as[(Int, Long, Long)].collect().toSet

      // reference: plain Scala double arithmetic, same literal constants
      val toksByDoc = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
      val n = toksByDoc.size.toDouble
      val total = toksByDoc.values.map(_.size).sum.toDouble
      def df(term: String) = toksByDoc.values.count(_.contains(term)).toDouble
      val expect = (for {
        (qid, terms) <- queries
        (id, toks) <- toksByDoc
        hits = terms.filter(toks.contains)
        if hits.nonEmpty
      } yield {
        val score = hits.map { term =>
          val tf = toks.count(_ == term).toDouble
          val idf = (2.0 * n - 2.0 * df(term) + 1.0) / (2.0 * df(term) + 1.0)
          val tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 *
            (toks.size.toDouble * n / total)))
          math.floor((idf * tfn) * 1e6).toLong
        }.sum
        (qid, id, score)
      }).toSet
      got == expect
    }
    run(prop)
  }
}
