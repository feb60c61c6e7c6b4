package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.HistogramRank

/** ScalaCheck pin for the histogram-rank technique x101/x107 ship on:
  * for ARBITRARY group/score shapes — heavy ties, singleton groups,
  * all-one-group, scores colliding into one bucket — the two-level
  * bucket rank must be bit-identical to the single-window
  * `row_number().over(partitionBy(grp).orderBy(score, id))` it replaces,
  * under every bucketing mode (score-value histogram and hash-top-bits),
  * and the free `totalName` count must equal the group size. */
class HistogramRankPropertySpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  /** (grp, score, id): few groups, small score domain (ties guaranteed),
    * unique ids. */
  private val rowsGen: Gen[Seq[(String, Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    grps <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    scores <- Gen.listOfN(n, Gen.choose(0L, 12L))
  } yield (0 until n).map(i => (grps(i), scores(i), i.toLong))

  test("histogram rank == window rank for arbitrary tied data, all bucketing modes; " +
      "group totals ride the same pass") {
    val buckets: Seq[(String, Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column])] =
      Seq(("exact", None), ("top-bits", Some(HistogramRank.hashBuckets(2))),
        ("one-bucket", Some(HistogramRank.hashBuckets(62))))
    val prop = Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("grp", "score", "id")
      val expected = df.withColumn("exp", row_number()
          .over(Window.partitionBy(col("grp")).orderBy(col("score"), col("id"))))
        .withColumn("exp_n", count(lit(1)).over(Window.partitionBy(col("grp"))))
      buckets.forall { case (label, b) =>
        val got = HistogramRank.rank(df, Seq("grp"), "score", "id",
          bucket = b, rankName = "rk", totalName = Some("n"))
        val bad = got.join(expected, Seq("grp", "score", "id"))
          .filter(col("rk") =!= col("exp") || col("n") =!= col("exp_n"))
          .count()
        if (bad != 0) println(s"bucket mode '$label': $bad mismatching rows")
        bad == 0 && got.count() == rows.size.toLong
      }
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withInitialSeed(13L), prop)
    assert(r.passed, s"property failed: ${r.status}")
  }
}
