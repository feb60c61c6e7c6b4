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

  test("tie sub-bucketing == window rank for arbitrary tied data (exact mode)") {
    // the recursion must change NOTHING semantically: same generator, same
    // window oracle, tieBuckets on — including sub-bucket counts far
    // larger than the tie groups (every distinct tie its own bucket)
    val prop = Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("grp", "score", "id")
      val expected = df.withColumn("exp", row_number()
          .over(Window.partitionBy(col("grp")).orderBy(col("score"), col("id"))))
      Seq(2, 4, 1024).forall { tb =>
        val got = HistogramRank.rank(df, Seq("grp"), "score", "id",
          rankName = "rk", tieBuckets = Some(tb))
        got.join(expected, Seq("grp", "score", "id"))
          .filter(col("rk") =!= col("exp")).count() == 0 &&
          got.count() == rows.size.toLong
      }
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withInitialSeed(29L), prop)
    assert(r.passed, s"property failed: ${r.status}")
  }

  test("degenerate single-valued score: a 5000-row tie group ranks correctly with " +
      "no row-data window partitioned by (group, score) alone") {
    // the residual this closes: with the score constant, the UN-sub-
    // bucketed plan funnels all 5000 rows through one row_number task.
    // Ranks must still be exact (= id order), and the executed plan's
    // only row_number window must carry the __hr_tbkt sub-bucket key.
    // Ids are deliberately NON-contiguous (quadratic spacing) so the
    // range split sees a skewed-but-realistic id distribution.
    val df = (0 until 5000).map(i => ("g", 7L, i.toLong * i + 3))
      .toDF("grp", "score", "id")
    val got = HistogramRank.rank(df, Seq("grp"), "score", "id",
      rankName = "rk", totalName = Some("n"), tieBuckets = Some(64))
    val plan = got.queryExecution.executedPlan.toString
    assert("row_number\\(\\) windowspecdefinition\\(grp#\\d+, score#\\d+L?, __hr_tbkt#\\d+L?".r
      .findFirstIn(plan).isDefined,
      s"tie window must partition by (grp, score, __hr_tbkt):\n${plan.take(1500)}")
    assert("row_number\\(\\) windowspecdefinition\\(grp#\\d+, score#\\d+L?, id#\\d+L? ASC".r
      .findFirstIn(plan).isEmpty,
      "an un-sub-bucketed tie window would funnel the whole tie group through one task")
    val checked = got.withColumn("exp",
      row_number().over(Window.orderBy(col("id"))))
    assert(checked.filter(col("rk") =!= col("exp") || col("n") =!= 5000L).count() == 0,
      "constant-score ranks must equal the id order")
    // sub-bucket occupancy sanity: the quadratic id space still spreads
    // over many buckets (range split, not everything in bucket 0)
    val nBkts = df.selectExpr("min(id) AS lo", "max(id) AS hi").head()
    val (lo, hi) = (nBkts.getLong(0), nBkts.getLong(1))
    val width = math.max(1L, (hi - lo) / 64 + 1)
    val distinctBuckets = df.select((((col("id") - lo) / width).cast("long")).as("b"))
      .distinct().count()
    assert(distinctBuckets > 8, s"range split must spread the tie group, got $distinctBuckets buckets")
  }

  test("tie sub-bucketing survives full-range 64-bit ties and fails fast on a null tie") {
    import spark.implicits._
    // extremes that would overflow a naive (tmax - tmin) span subtraction:
    // the divide-first width must still produce a monotone split
    val ids = Seq(Long.MinValue, Long.MinValue + 7, -3L, 0L, 5L,
      Long.MaxValue - 11, Long.MaxValue)
    val df = ids.map(i => ("g", 1L, i)).toDF("grp", "score", "id")
    // tieBuckets = 2 is the overflow worst case: the tb-quotient difference
    // equals Long.MaxValue exactly, where an uncapped + 1L wraps the width
    // to Long.MinValue, greatest() collapses it to 1, and (tie - tmin)
    // wraps — silently wrong ranks
    for (tb <- Seq(2, 4)) {
      val got = HistogramRank.rank(df, Seq("grp"), "score", "id",
          rankName = "rk", tieBuckets = Some(tb))
        .orderBy(col("id")).select(col("rk")).as[Long].collect().toSeq
      assert(got == (1L to ids.size.toLong),
        s"full-range ties must rank in id order at tieBuckets=$tb, got $got")
    }
    // a null tie must FAIL (it would silently drop through the sub-bucket
    // equi-join), unlike the un-sub-bucketed mode where it merely sorts first
    val withNull = Seq(("g", 1L, Some(2L)), ("g", 1L, Option.empty[Long]))
      .toDF("grp", "score", "id")
    val e = intercept[Exception] {
      HistogramRank.rank(withNull, Seq("grp"), "score", "id",
        rankName = "rk", tieBuckets = Some(4)).count()
    }
    assert(e.getMessage != null && (e.getMessage.contains("long-castable") ||
      Option(e.getCause).exists(_.getMessage.contains("long-castable"))),
      s"null tie must fail fast with the remedy, got: $e")
  }

  test("tieBuckets orders ties by their long cast — a string tie whose raw order disagrees " +
      "with its numeric order still ranks numerically") {
    import spark.implicits._
    // raw string order: '10' < '100' < '9'; the sub-bucket boundaries
    // follow the long cast, so the within-bucket order must too — a raw
    // tie order would disagree with the boundaries and mis-rank
    val df = Seq(("g", 1L, "10"), ("g", 1L, "9"), ("g", 1L, "100"))
      .toDF("grp", "score", "id")
    val ranks = HistogramRank.rank(df, Seq("grp"), "score", "id",
        rankName = "rk", tieBuckets = Some(2))
      .orderBy(col("id").cast("bigint")).select(col("rk")).as[Long].collect().toSeq
    assert(ranks == Seq(1L, 2L, 3L),
      s"ties must rank in numeric (cast) order 9 < 10 < 100, got $ranks")
  }

  test("tieBuckets rejects the hash-bucket mode and degenerate bucket counts") {
    val df = Seq(("g", 1L, 1L)).toDF("grp", "score", "id")
    intercept[IllegalArgumentException] {
      HistogramRank.rank(df, Seq("grp"), "score", "id",
        bucket = Some(HistogramRank.hashBuckets(32)), tieBuckets = Some(4))
    }
    intercept[IllegalArgumentException] {
      HistogramRank.rank(df, Seq("grp"), "score", "id", tieBuckets = Some(1))
    }
  }
}
