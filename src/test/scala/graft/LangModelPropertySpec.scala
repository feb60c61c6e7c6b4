package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.{LangModel, Packing}

/** ScalaCheck properties for the model-based curation ops: the distributed
  * integer-exact pipelines (bigram LM scoring, DSIR importance weights,
  * token-id encoding) must equal sequential driver-side reference folds
  * bit-for-bit on ARBITRARY small corpora — tie-breaks, OOV smoothing,
  * floor divisions and threshold gates included. */
class LangModelPropertySpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  private def run(prop: Prop, n: Int = 25): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val vocab = Seq("ant", "bee", "cat", "dog", "elk", "fox")
  private def toks(t: String): Seq[String] = t.split(" ").filter(_.nonEmpty).toSeq

  /** Corpora of 6 docs x 2-6 tokens; the first doc is always in the
    * reference slice so the trained model is never empty. */
  private val corpusGen: Gen[List[(String, Boolean)]] =
    Gen.listOfN(6, for {
      n <- Gen.chooseNum(2, 6)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
      flag <- Gen.oneOf(true, false)
    } yield (ws.mkString(" "), flag)).map {
      case (t, _) :: rest => (t, true) :: rest
      case Nil => Nil
    }

  test("bigram fluency equals the sequential Laplace-smoothed reference fold") {
    val prop = Prop.forAll(corpusGen) { corpus =>
      val docs = corpus.zipWithIndex
        .map { case ((t, f), i) => (i.toLong, t, f) }
        .toDF("doc_id", "text", "is_ref")
      val gotFull = LangModel.bigramFluency(docs, $"is_ref")
        .select($"doc_id".as[Long], $"n_bigrams".as[Long], $"fluency_micro".as[Long])
        .collect().map(r => r._1 -> (r._2, r._3)).toMap

      val train = corpus.filter(_._2).map(d => toks(d._1)).filter(_.size >= 2)
      val bgs = train.flatMap(ws => ws.zip(ws.tail))
      val c12 = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c1 = bgs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val v = train.flatten.distinct.size.toLong
      val want = corpus.zipWithIndex.flatMap { case ((t, _), i) =>
        val ws = toks(t)
        if (ws.size < 2) None
        else {
          val ps = ws.zip(ws.tail).map(bg =>
            (1000000L * (c12.getOrElse(bg, 0L) + 1)) / (c1.getOrElse(bg._1, 0L) + v))
          Some(i.toLong -> (ps.size.toLong, ps.sum / ps.size))
        }
      }.toMap
      gotFull == want
    }
    run(prop)
  }

  test("DSIR weights and selection equal the sequential BigInt reference") {
    val B = 256
    def bucket(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % B
    }
    val prop = Prop.forAll(corpusGen) { corpus =>
      val docs = corpus.zipWithIndex
        .map { case ((t, f), i) => (i.toLong, t, f) }
        .toDF("doc_id", "text", "is_tgt")
      val got = LangModel.dsirSelect(docs, $"is_tgt", buckets = B)
        .select($"doc_id".as[Long], $"n_tokens".as[Long],
          $"dsir_micro".as[Long], $"selected".as[Int])
        .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap

      val all = corpus.zipWithIndex.flatMap { case ((t, f), i) =>
        toks(t).map(w => (i.toLong, bucket(w), f)) }
      val ct = all.filter(_._3).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val cq = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val nt = all.count(_._3).toLong
      val nq = all.size.toLong
      val ratio: Map[Long, Long] = cq.map { case (b, c) =>
        b -> (BigInt(1000000) * BigInt(ct.getOrElse(b, 0L) + 1) * BigInt(nq + B)
          / (BigInt(c + 1) * BigInt(nt + B))).toLong
      }
      val scores = all.groupBy(_._1).view.mapValues { rows =>
        val rs = rows.map(r => BigInt(ratio(r._2)))
        (rows.size.toLong, (rs.sum / rs.size).toLong)
      }.toMap
      val thr = (scores.values.map(s => BigInt(s._2)).sum / scores.size).toLong
      val want = scores.map { case (id, (n, s)) =>
        id -> (n, s, if (s > thr) 1 else 0) }
      got == want
    }
    run(prop)
  }

  test("token-id encoding equals the sequential rank/UNK reference") {
    val K = 4 // smaller than the 6-word vocab so UNK genuinely occurs
    val prop = Prop.forAll(corpusGen) { corpus =>
      val docs = corpus.zipWithIndex
        .map { case ((t, _), i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Packing.encodeTokenIds(docs, vocabSize = K)
        .select($"doc_id".as[Long], $"n_tokens".as[Long], $"ids".as[String])
        .collect().map(r => r._1 -> (r._2, r._3)).toMap

      val counts = corpus.flatMap(d => toks(d._1))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ids = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(K)
        .zipWithIndex.map { case ((w, _), i) => w -> (i + 1) }.toMap
      val want = corpus.zipWithIndex.map { case ((t, _), i) =>
        val ws = toks(t)
        i.toLong -> (ws.size.toLong, ws.map(w => ids.getOrElse(w, 0)).mkString(" "))
      }.toMap
      got == want
    }
    run(prop)
  }
}
