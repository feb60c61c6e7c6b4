package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.tables.TableStore

/** Property: a table in merge-on-read mode and a copy-on-write twin fed
  * the SAME random DML sequence hold the SAME rows after every statement —
  * deletion vectors are an execution strategy, never a semantics change.
  * Also pins the mode's defining property: mor DML never rewrites or
  * removes a pre-existing data file. */
class MorCowPropertySpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)

  private sealed trait Op
  private case class Del(mod: Int, rem: Int) extends Op
  private case class Upd(mod: Int, rem: Int, bump: Double) extends Op

  private val genOp: Gen[Op] = Gen.oneOf(
    for { m <- Gen.choose(2, 7); r <- Gen.choose(0, 6) } yield Del(m, r % m),
    for { m <- Gen.choose(2, 7); r <- Gen.choose(0, 6); b <- Gen.choose(1, 9) }
      yield Upd(m, r % m, b.toDouble))

  test("random DML sequences: mor == cow row-for-row; mor never touches old files") {
    import spark.implicits._
    var round = 0
    val prop = Prop.forAll(Gen.listOfN(4, genOp)) { ops =>
      round += 1
      val root = Files.createTempDirectory(s"graft_morprop_$round").toString
      val store = new TableStore(spark, root)
      try {
        val df = spark.range(0, 400)
          .select(col("id").as("k"), (col("id") % 10).cast("double").as("v"))
          .repartition(4)
        store.createOrReplace("db.mor", df)
        store.createOrReplace("db.cow", df)
        store.setDmlMode("db.mor", "mor")

        def files(t: String): Map[String, Long] = {
          val dir = java.nio.file.Paths.get(root, "db", t)
          val out = scala.collection.mutable.Map.empty[String, Long]
          Files.walk(dir).forEach { p =>
            if (p.getFileName.toString.endsWith(".parquet"))
              out += (dir.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis)
          }
          out.toMap
        }

        ops.foreach { op =>
          val before = files("mor")
          op match {
            case Del(m, r) =>
              store.delete("db.mor", col("k") % m === r)
              store.delete("db.cow", col("k") % m === r)
            case Upd(m, r, b) =>
              store.update("db.mor", col("k") % m === r, Map("v" -> (col("v") + b)))
              store.update("db.cow", col("k") % m === r, Map("v" -> (col("v") + b)))
          }
          val after = files("mor")
          before.foreach { case (rel, mtime) =>
            assert(after.get(rel).contains(mtime),
              s"mor DML rewrote or removed pre-existing file $rel (op $op)")
          }
          val morRows = store.read("db.mor").as[(Long, Double)].collect().sorted.toSeq
          val cowRows = store.read("db.cow").as[(Long, Double)].collect().sorted.toSeq
          assert(morRows == cowRows, s"mor and cow diverged after $op in $ops")
        }
        // OPTIMIZE folds the DVs in and preserves the rows exactly
        val beforeOpt = store.read("db.mor").as[(Long, Double)].collect().sorted.toSeq
        store.compact("db.mor")
        assert(store.read("db.mor").as[(Long, Double)].collect().sorted.toSeq == beforeOpt)
        true
      } finally store.detach()
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withInitialSeed(13L), prop)
    assert(result.passed, result.status.toString)
  }
}
