package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.{Dedup, Expectations}
import graft.operators.Expectations.{Expectation => E}

/** ScalaCheck properties for the round-9 curation operators: the
  * expectations gate must partition ARBITRARY data exactly as a
  * sequential reference filter does (including NULL predicate results,
  * which must gate as failures), and segment dedup must keep exactly one
  * copy of every distinct segment and reassemble losslessly for
  * ARBITRARY word streams. */
class QualityGatePropertySpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  private def run(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("expectations partition arbitrary data like a sequential reference (NULL fails)") {
    val rowGen = Gen.zip(Gen.chooseNum(-50, 50),
      Gen.option(Gen.chooseNum(-50, 50)))
    val prop = Prop.forAll(Gen.listOfN(40, rowGen), Gen.chooseNum(-20, 20),
      Gen.chooseNum(-20, 20)) { (rows, cutA, cutB) =>
      val df = rows.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b.map(Integer.valueOf).orNull) }
        .toDF("id", "a", "b")
      val gates = Seq(E("ga", col("a") > cutA, "drop"),
        E("gb", col("b") <= cutB, "drop"))
      val (kept, quar) = Expectations.enforce(df, gates)
      val gotKept = kept.select($"id").as[Long].collect().toSet
      val gotQuar = quar.select($"id",
        array_join($"_violations", ",")).as[(Long, String)].collect().toMap
      // sequential reference: NULL comparisons fail the gate
      val ref = rows.zipWithIndex.map { case ((a, b), i) =>
        val va = a > cutA
        val vb = b.exists(_ <= cutB)
        (i.toLong, va, vb)
      }
      val refKept = ref.collect { case (i, true, true) => i }.toSet
      val refQuar = ref.collect { case (i, va, vb) if !va || !vb =>
        i -> Seq(if (!va) Some("ga") else None, if (!vb) Some("gb") else None)
          .flatten.mkString(",")
      }.toMap
      val report = Expectations.report(df, gates)
        .select($"expectation", $"n_pass", $"n_fail")
        .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      gotKept == refKept && gotQuar == refQuar &&
        report("ga") == ((ref.count(_._2).toLong, ref.count(!_._2).toLong)) &&
        report("gb") == ((ref.count(_._3).toLong, ref.count(!_._3).toLong))
    }
    run(prop)
  }

  test("segment dedup keeps one copy of every distinct segment and reassembles losslessly") {
    val vocab = Seq("ant", "bee", "cat", "dog")
    val docGen = Gen.listOfN(10, Gen.chooseNum(0, 11).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" "))))
    val prop = Prop.forAll(docGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val seg = 3
      val out = Dedup.segmentDedup(docs, segTokens = seg)
        .select($"doc_id", $"n_segs", $"kept_segs", $"kept_text")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      // sequential reference: global first-occurrence over (doc, seg) order
      val refSegs = texts.zipWithIndex.flatMap { case (t, i) =>
        val toks = t.split(" ").filter(_.nonEmpty)
        toks.grouped(seg).zipWithIndex.map { case (g, s) => (i.toLong, s, g.mkString(" ")) }
      }
      val seen = scala.collection.mutable.Set.empty[String]
      val refKept = refSegs.map { case (d, s, txt) =>
        (d, s, txt, seen.add(txt))
      }
      val refByDoc = refKept.groupBy(_._1).map { case (d, xs) =>
        d -> ((xs.size.toLong, xs.count(_._4).toLong,
          xs.sortBy(_._2).collect { case (_, _, t, true) => t }.mkString(" ")))
      }
      out.forall { case (d, n, k, txt) => refByDoc.get(d).contains((n, k, txt)) } &&
        out.map(_._1).toSet == refByDoc.keySet
    }
    run(prop)
  }
}
