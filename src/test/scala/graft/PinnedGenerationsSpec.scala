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
    // 18 genuinely different inputs (different filters => different plans)
    // — more than the 16-generation cap, so eviction must engage
    (0 until 18).foreach { i =>
      Dedup.firstSeenDedup(docs.filter(org.apache.spark.sql.functions.col("doc_id") % 23 =!= i),
        "doc_id", "text", 3, 4, 2).count()
    }
    assert(PinnedGenerations.size <= 16,
      s"generation map must stay LRU-bounded, got ${PinnedGenerations.size}")
    spark.catalog.clearCache()
    PinnedGenerations.reset()
  }

  test("a store-version bump misses the plan cache: stale pinned frames are " +
      "never served across table versions") {
    spark.catalog.clearCache()
    PinnedGenerations.reset()
    val root = java.nio.file.Files.createTempDirectory("graft_pin_ver")
    val store = new graft.tables.TableStore(spark, root.toString)
    try {
      store.createOrReplace("pin.docs", docs.limit(200))
      def run() = Dedup.firstSeenDedup(
        store.read("pin.docs"), "doc_id", "text", 3, 4, 2).count()
      val n1 = run()
      assert(PinnedGenerations.size == 1)
      // version bump: the manifest's explicit leaf-file list is part of
      // the read plan, so the canonicalized key MUST change — a pinned
      // frame from v1 serving v2 reads would be a stale-cache bug
      store.append("pin.docs", docs.limit(300).filter(
        org.apache.spark.sql.functions.col("doc_id") >= 200))
      val n2 = run()
      assert(PinnedGenerations.size == 2,
        "the post-append read must register a NEW generation, not reuse v1's")
      assert(n2 > n1, s"post-append dedup must see the appended rows ($n1 -> $n2)")
    } finally {
      store.detach()
      graft.queries.Scratch.deleteRecursively(root)
      spark.catalog.clearCache()
      PinnedGenerations.reset()
    }
  }

  test("SCALE: evicted generations recompute correctly under corpus-scale churn " +
      "(bounded pinned footprint, no OOM)") {
    assume(sys.env.get("GRAFT_SCALE_SMOKE").contains("1"),
      "set GRAFT_SCALE_SMOKE=1 to run the eviction-under-scale smoke")
    spark.catalog.clearCache()
    PinnedGenerations.reset()
    val prev = sys.props.get("graft.pinned.maxGenerations")
    sys.props("graft.pinned.maxGenerations") = "2"
    try {
      import org.apache.spark.sql.functions._
      // corpus-scale input without extra files: 8 plan-level replicas of
      // the sf0.01 documents with shifted ids and per-replica word salt
      // (suffixed text), so the dedup pipeline sees a realistic dup rate
      val d01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select(col("doc_id"), col("text"))
      val big = (0 until 8).map(r => d01.select(
          (col("doc_id") + lit(r * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" replica$r")).as("text")))
        .reduce(_ unionAll _)
      def run(i: Int) = Dedup.firstSeenDedup(
          big.filter(col("doc_id") % 1009 =!= i), "doc_id", "text", 3, 4, 2)
        .agg(count(lit(1)), sum(col("doc_id"))).head()
      val a0 = run(0) // generation A
      run(1); run(2) // B, C: cap 2 forces A's eviction mid-session
      assert(PinnedGenerations.size <= 2,
        s"pinned footprint must stay bounded, got ${PinnedGenerations.size}")
      // A's frames were unpersisted — the repeat must recompute from
      // lineage and return the identical result (eviction is
      // correctness-neutral, VERDICT r16 #7)
      assert(run(0) == a0, "evicted generation must recompute to the same result")
    } finally {
      prev.fold { sys.props.remove("graft.pinned.maxGenerations"); () } {
        v => sys.props("graft.pinned.maxGenerations") = v; () }
      spark.catalog.clearCache()
      PinnedGenerations.reset()
    }
  }
}
