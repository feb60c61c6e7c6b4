package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted}
import org.apache.spark.sql.GraftShims
import org.scalatest.funsuite.AnyFunSuite
import graft.core.PinnedGenerations
import graft.operators.Dedup

/** Pins the round-16 cache-lifecycle contract for the one-shot dedup/fuzzy
  * family (the round-15 regression): a REPEATED call on the same corpus
  * must REUSE the pinned corpus-scale frames — no shuffle-stage
  * recomputation of the shingle/signature/band pipeline — while a
  * multi-corpus session stays bounded at the generation cap. */
class PinnedGenerationsSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  /** Stage submissions attributed to `group` while `body` runs — skipped
    * stages (reused shuffle output) never fire StageSubmitted, so this
    * counts stages that actually (re)computed. */
  private def stagesIn(group: String)(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        if (Option(s.properties).exists(p =>
            group == p.getProperty("spark.jobGroup.id"))) { n.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(l)
    spark.sparkContext.setJobGroup(group, group)
    try body
    finally {
      spark.sparkContext.clearJobGroup()
      GraftShims.waitListenerBusEmpty(spark)
      spark.sparkContext.removeSparkListener(l)
    }
    n.get()
  }

  test("second identical dedup call reuses the pinned generation: no recomputation " +
      "of the band-key pipeline's shuffle stages") {
    spark.catalog.clearCache()
    PinnedGenerations.reset()
    def run() = Dedup.firstSeenDedup(docs, "doc_id", "text", 3, 4, 2).count()
    val first = stagesIn("pinned-first") { run(); () }
    // same corpus, same params => same canonicalized plan => the pinned
    // band-key cache must survive and serve the whole shingle→signature
    // pipeline from memory: strictly fewer stages actually compute
    val second = stagesIn("pinned-second") { run(); () }
    assert(second < first,
      s"repeated call must reuse the pinned frames (stages: first=$first second=$second)")
    assert(PinnedGenerations.size == 1,
      "a repeated call must touch the live generation, not register a new one")
    spark.catalog.clearCache()
    PinnedGenerations.reset()
  }

  test("distinct inputs register distinct generations, bounded by the LRU cap") {
    spark.catalog.clearCache()
    PinnedGenerations.reset()
    // 6 genuinely different inputs (different filters => different plans)
    (0 until 6).foreach { i =>
      Dedup.firstSeenDedup(docs.filter(org.apache.spark.sql.functions.col("doc_id") % 7 =!= i),
        "doc_id", "text", 3, 4, 2).count()
    }
    assert(PinnedGenerations.size <= 4,
      s"generation map must stay LRU-bounded, got ${PinnedGenerations.size}")
    spark.catalog.clearCache()
    PinnedGenerations.reset()
  }
}
