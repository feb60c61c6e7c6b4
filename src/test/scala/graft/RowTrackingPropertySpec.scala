package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.tables.TableStore
import graft.operators.MergeInto

/** Property: under ANY random sequence of UPDATE / DELETE / MERGE /
  * OPTIMIZE / append, a surviving row's `_row_id` NEVER changes, ids
  * stay unique, and rows minted by inserts never reuse a retired id.
  * This is the whole row-tracking contract in one invariant; the
  * example-based RowTrackingSpec pins each path, this hammers their
  * compositions (e.g. merge-after-optimize-after-mor-delete). */
class RowTrackingPropertySpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)

  private sealed trait Op
  private case class Del(mod: Int, rem: Int) extends Op
  private case class Upd(mod: Int, rem: Int, bump: Double) extends Op
  private case class Mrg(mod: Int, rem: Int, newKeys: Int) extends Op
  private case class App(n: Int) extends Op
  private case object Opt extends Op

  private val genOp: Gen[Op] = Gen.oneOf(
    for { m <- Gen.choose(3, 9); r <- Gen.choose(0, 8) } yield Del(m, r % m),
    for { m <- Gen.choose(2, 7); r <- Gen.choose(0, 6); b <- Gen.choose(1, 9) }
      yield Upd(m, r % m, b.toDouble),
    for { m <- Gen.choose(2, 6); r <- Gen.choose(0, 5); n <- Gen.choose(1, 5) }
      yield Mrg(m, r % m, n),
    Gen.choose(1, 8).map(App(_)),
    Gen.const(Opt))

  test("random DML sequences never move, duplicate or resurrect a row id") {
    var round = 0
    val prop = Prop.forAll(Gen.listOfN(5, genOp)) { ops =>
      round += 1
      val root = Files.createTempDirectory(s"graft_rtprop_$round").toString
      val store = new TableStore(spark, root)
      try {
        store.createOrReplace("db.t",
          spark.range(0, 300).select(col("id").as("k"),
            (col("id") % 10).cast("double").as("v")).repartition(3))
        store.enableRowTracking("db.t")
        if (round % 2 == 0) store.setDmlMode("db.t", "mor")
        // fresh keys live far above the merge-source probe range [0, 2000)
        // so a source can never carry the same key twice (multi-match)
        var nextKey = 1000000L
        var everIds = Set.empty[Long] // every id ever observed live

        def snapshot(): Map[Long, Long] =
          store.readWithRowIds("db.t").select(col("k"), col("_row_id"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

        var prev = snapshot()
        everIds ++= prev.values
        ops.foreach { op =>
          op match {
            case Del(m, r) => store.delete("db.t", col("k") % m === r)
            case Upd(m, r, b) =>
              store.update("db.t", col("k") % m === r, Map("v" -> (col("v") + b)))
            case Mrg(m, r, n) =>
              val src = spark.range(0, 2000).select(col("id").as("k"),
                  lit(-1.0).as("v")).filter(col("k") % m === r)
                .unionByName(spark.range(nextKey, nextKey + n)
                  .select(col("id").as("k"), lit(-2.0).as("v")))
              nextKey += n
              store.merge("db.t", src, keys = Seq("k"),
                matched = Seq(MergeInto.MatchedUpdate(None, Map("v" -> col("s.v")))),
                notMatched = Seq(MergeInto.NotMatchedInsert(None,
                  Map("k" -> col("s.k"), "v" -> col("s.v")))))
            case App(n) =>
              store.append("db.t", spark.range(nextKey, nextKey + n)
                .select(col("id").as("k"), lit(0.5).as("v")))
              nextKey += n
            case Opt => store.compact("db.t", targetFiles = 2)
          }
          val cur = snapshot()
          // 1. surviving keys keep their exact id
          cur.foreach { case (k, id) =>
            prev.get(k).foreach(old => assert(old == id,
              s"id of k=$k moved $old -> $id after $op in $ops"))
          }
          // 2. ids stay unique
          assert(cur.values.toSet.size == cur.size, s"duplicate ids after $op in $ops")
          // 3. fresh rows never reuse an id that has ever been live
          val freshRows = cur.filterNot { case (k, _) => prev.contains(k) }
          freshRows.foreach { case (k, id) =>
            assert(!everIds.contains(id),
              s"new row k=$k resurrected retired id $id after $op in $ops")
          }
          everIds ++= cur.values
          prev = cur
        }
        true
      } finally store.detach()
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6).withInitialSeed(29L), prop)
    assert(result.passed, result.status.toString)
  }
}
