package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.tables.TableStore

/** Property: dynamic file pruning is SOUND — for any table layout and any
  * probe set, a semi-join against the point-pruned scan returns exactly
  * the semi-join against the full scan. Pruning may keep extra files
  * (conservative), never drop a matching row. Exercised over random key
  * distributions (clustered, scattered, duplicated), random file layouts
  * and random probes, including keys absent from the table. */
class PointPrunePropertySpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)

  private case class Case(rows: Seq[Long], files: Int, probe: Seq[Long])

  private val genCase: Gen[Case] = for {
    n <- Gen.choose(50, 400)
    // value space much larger than n -> scattered; comparable -> dense/dup
    space <- Gen.oneOf(100L, 1000L, 100000L)
    rows <- Gen.listOfN(n, Gen.choose(0L, space))
    files <- Gen.choose(2, 12)
    pn <- Gen.choose(1, 20)
    probe <- Gen.listOfN(pn, Gen.oneOf(Gen.choose(0L, space), Gen.choose(0L, 10L)))
  } yield Case(rows, files, probe)

  test("point-pruned semi-join == full semi-join for random layouts and probes") {
    import spark.implicits._
    var round = 0
    val prop = Prop.forAll(genCase) { c =>
      round += 1
      val root = Files.createTempDirectory(s"graft_ppprop_$round").toString
      val store = new TableStore(spark, root)
      try {
        store.createOrReplace("db.p",
          c.rows.toDF("k").repartitionByRange(c.files, col("k")),
          sortWithin = Seq("k"), statsFor = Seq("k"))
        val probe = c.probe.toDF("k")
        val (pruned, (cand, tot)) = store.readPointPruned("db.p", probe, Seq("k"))
        val got = probe.join(pruned, Seq("k"), "left_semi")
          .select($"k".as[Long]).collect().sorted.toSeq
        val want = probe.join(store.read("db.p"), Seq("k"), "left_semi")
          .select($"k".as[Long]).collect().sorted.toSeq
        assert(cand <= tot)
        got == want
      } finally store.detach()
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25).withInitialSeed(9L), prop)
    assert(res.passed, res.status.toString)
  }
}
