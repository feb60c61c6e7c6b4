package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, Salting}

/** As-of join tie/miss semantics and salting result-parity. */
class AdvancedOpsSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  test("asof backward: inclusive ties, misses are null, latest-wins") {
    val left = Seq((1, 10L, "a"), (1, 20L, "b"), (1, 5L, "c"), (2, 50L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1, 10L, 1.0), (1, 15L, 2.0), (3, 1L, 9.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asofBackward(left, right, Seq("k"), "t", "t",
        Map("v" -> "rv"))
      .select($"tag", $"rv").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "a" -> Some(1.0),  // tie at t=10 matches (inclusive)
      "b" -> Some(2.0),  // latest of 10,15
      "c" -> None,       // nothing at or before 5
      "d" -> None))      // key 2 has no right rows
  }

  test("salted join equals plain join; hot key spread over buckets") {
    val big = spark.range(10000)
      .select((col("id") % 3).as("k"), col("id").as("v"))
    val small = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).groupBy($"name").count()
    val salted = Salting.saltedJoin(big, small, Seq("k"), buckets = 8)
      .groupBy($"name").count()
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    // salt actually spreads: distinct (k, salt) combos > distinct k
    val combos = big.withColumn("s", Salting.saltCol(8, big.columns.map(col): _*))
      .select($"k", $"s").distinct().count()
    assert(combos > 3, s"expected hot keys spread over salt buckets, got $combos combos")
  }
}
