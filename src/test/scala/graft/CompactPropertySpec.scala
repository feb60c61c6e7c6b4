package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.tables.TableStore

/** Property: OPTIMIZE (plain compaction) preserves the row multiset for
  * any layout, and — when a stats layout is recorded — lays output files
  * out along it, so a point probe after compaction prunes to at most a
  * couple of files (the box holding the value plus possibly a boundary
  * tie). Pins the round-9 change that replaced round-robin consolidation
  * with stats-layout range partitioning. */
class CompactPropertySpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)

  private case class Case(rows: Seq[(Long, Long)], inFiles: Int,
      target: Int, declareStats: Boolean, probe: Long)

  private val genCase: Gen[Case] = for {
    n <- Gen.choose(60, 300)
    space <- Gen.oneOf(200L, 5000L)
    ks <- Gen.listOfN(n, Gen.choose(0L, space))
    inFiles <- Gen.choose(1, 6)
    target <- Gen.choose(1, 8)
    declare <- Gen.oneOf(true, false)
    probe <- Gen.choose(0L, space)
  } yield Case(ks.map(k => (k, k % 7)), inFiles, target, declare, probe)

  test("compact preserves rows; stats-layout compaction makes point probes prune") {
    import spark.implicits._
    var round = 0
    val prop = Prop.forAll(genCase) { c =>
      round += 1
      val root = Files.createTempDirectory(s"graft_cprop_$round").toString
      val store = new TableStore(spark, root)
      try {
        val df = c.rows.toDF("k", "v").repartition(c.inFiles)
        if (c.declareStats)
          store.createOrReplace("db.c", df, statsFor = Seq("k"))
        else store.createOrReplace("db.c", df)
        val before = store.read("db.c").select($"k", $"v")
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        store.compact("db.c", targetFiles = c.target)
        val after = store.read("db.c").select($"k", $"v")
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(after == before, "compact must preserve the row multiset")
        if (c.declareStats && c.target >= 3) {
          val total = store.prunedFileList("db.c", None).size
          val hit = store.prunedFileList("db.c", Some(col("k") === c.probe)).size
          // range layout: the probe lands in one box, plus possible
          // boundary ties between adjacent files sharing a key value
          assert(hit <= math.max(2, total / 2),
            s"post-compact point probe kept $hit of $total files")
        }
        true
      } finally store.detach()
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20).withInitialSeed(17L), prop)
    assert(res.passed, res.status.toString)
  }
}
