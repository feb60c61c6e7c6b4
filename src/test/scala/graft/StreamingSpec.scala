package graft

import java.sql.Timestamp
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Session, SessionEvent}

/** Structured Streaming semantics: the streaming transforms produce the
  * same results as their batch twins on the same files, duplicates are
  * dropped within the watermark, and stateful sessionization closes
  * sessions on gap/timeout. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("streaming tumbling agg == batch tumbling agg over the same parquet") {
    val stream = EventStreams.readEventStream(spark, dir)
    val q = EventStreams.tumblingAgg(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
      val batch = EventStreams.tumblingAgg(spark.read.parquet(s"$dir/events.parquet"))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream and batch results must be identical")
    } finally q.stop()
  }

  test("readEventStream resolves a directory-of-part-files events table (Spark-written " +
      "layout) identically to the single-file layout") {
    // the generated testdata is a single FILE named events.parquet; anything
    // Spark itself writes (the 10x smoke's scaled inputs, a real pipeline's
    // output) is a DIRECTORY of part-files — a glob filter on the table
    // name matches zero part-files there and would silently stream nothing
    val d = java.nio.file.Files.createTempDirectory("graft_evt_dirlayout").toString
    try {
      spark.read.parquet(s"$dir/events.parquet").repartition(3)
        .write.parquet(s"$d/events.parquet")
      val q = EventStreams.tumblingAgg(EventStreams.readEventStream(spark, d))
        .writeStream.outputMode("complete")
        .format("memory").queryName("dirlayout_out").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("dirlayout_out")
        val batch = EventStreams.tumblingAgg(spark.read.parquet(s"$dir/events.parquet"))
        assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
          "directory-layout stream must equal the single-file batch result")
      } finally q.stop()
    } finally graft.queries.Scratch.deleteRecursively(java.nio.file.Paths.get(d))
  }

  test("stream-static enrichment: streaming events x store dimension == batch twin") {
    // dimension lives in the table store — the streaming medallion shape
    // (facts stream, dims sit in the lakehouse); the static side is
    // re-planned per micro-batch, and the planner broadcasts it from its
    // OWN relation statistics — the operator forces no hint (a user-keyed
    // dim is user-cardinality; PlanSpec pins the fixture-scale choice)
    val store = new graft.tables.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_dim").toString)
    // PARTIAL dimension (odd keys only) so some events have no dim row —
    // the left join's 'N/A' unknown-member branch is exercised too
    store.createOrReplace("gold.user_seg",
      spark.read.parquet(s"$dir/customer.parquet")
        .filter($"c_custkey" % 2 === 1)
        .select($"c_custkey".as("user_id"), $"c_mktsegment".as("segment")))
    try {
      val stream = EventStreams.readEventStream(spark, dir)
      val q = EventStreams.enrichedTumblingAgg(stream, store.read("gold.user_seg"))
        .writeStream.outputMode("complete")
        .format("memory").queryName("enrich_out").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("enrich_out")
        val batch = EventStreams.enrichedTumblingAgg(
          spark.read.parquet(s"$dir/events.parquet"), store.read("gold.user_seg"))
        assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
          "stream-static enrichment must equal its batch twin")
        // unknown users (no dim row) survive under the 'N/A' member
        assert(batch.filter($"segment" === "N/A").count() > 0,
          "expected unmatched events under the N/A unknown member")
      } finally q.stop()
    } finally store.detach()
  }

  test("streaming dropDuplicates removes replayed event_ids") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp, Double)]
    val df = events.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.dedupedStream(df)
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      events.addData((1L, t0, 1.0), (2L, t0, 2.0), (1L, t0, 1.0))
      q.processAllAvailable()
      events.addData((2L, t0, 2.0), (3L, t0, 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select($"event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), "each id exactly once across batches")
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on 30-minute gaps") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[SessionEvent]
    val sessions = EventStreams.sessionize(events.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      def ts(m: Int) = new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + m * 60000L)
      // user 1: two sessions separated by a 60-min gap; user 2: one session
      events.addData(
        SessionEvent(1L, ts(0), "view"), SessionEvent(1L, ts(10), "click"),
        SessionEvent(2L, ts(5), "view"))
      q.processAllAvailable()
      events.addData(SessionEvent(1L, ts(70), "view"))
      q.processAllAvailable()
      // advance watermark far enough to time out all state
      events.addData(SessionEvent(99L, ts(600), "view"))
      q.processAllAvailable()
      events.addData(SessionEvent(99L, ts(1200), "view"))
      q.processAllAvailable()
      val out = spark.table("sessions_out").as[Session].collect()
        .filter(_.user_id != 99L).sortBy(s => (s.user_id, s.session_start.getTime))
      assert(out.map(s => (s.user_id, s.n_events)).toSeq == Seq((1L, 2L), (1L, 1L), (2L, 1L)),
        s"got: ${out.mkString("; ")}")
    } finally q.stop()
  }

  test("streaming funnel over event-time-split batches == batch funnel; no restart after completion") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.FunnelEvent
    val steps = Seq("view", "click", "purchase")
    val all = spark.read.parquet(s"$dir/events.parquet")
      .select($"user_id", $"ts".cast("timestamp").as("ts"), $"event_type")
      .as[FunnelEvent].collect().sortBy(_.ts.getTime)
    val events = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelStream(events.toDS(), steps, windowSecs = 86400L)
      .writeStream.outputMode("append").format("memory").queryName("funnel_out").start()
    try {
      // three uneven event-time-ordered batches — boundaries must be invisible
      val (b1, rest) = all.splitAt(all.length / 4)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b => events.addData(b.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("funnel_out")
        .groupBy($"step", $"step_name").agg(count(lit(1)).as("users"))
      val batch = graft.operators.Funnel.conversion(
        spark.read.parquet(s"$dir/events.parquet"), steps, windowSecs = 86400L)
        .filter($"users" > 0)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streaming hits must aggregate to exactly the batch funnel")
      // replaying the whole history emits nothing new: every user's state
      // vector (tombstone included) already covers it
      val before = spark.table("funnel_out").count()
      events.addData(all.toIndexedSeq); q.processAllAvailable()
      val after = spark.table("funnel_out").count()
      assert(before == after, s"replay must be a no-op, got $before -> $after")
    } finally q.stop()
  }

  test("streaming transitions over event-time-split batches == batch matrix (pairs span boundaries)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.TransEvent
    val all = spark.read.parquet(s"$dir/events.parquet")
      .select($"user_id", $"ts".cast("timestamp").as("ts"), $"event_id", $"event_type")
      .as[TransEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val events = MemoryStream[TransEvent]
    val q = EventStreams.transitionStream(events.toDS())
      .writeStream.outputMode("append").format("memory").queryName("trans_out").start()
    try {
      // three uneven event-time-ordered batches: each user's boundary-
      // spanning pair must form from the carried last-event state
      val (b1, rest) = all.splitAt(all.length / 4)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b => events.addData(b.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("trans_out")
        .groupBy($"prev_type", $"next_type").agg(count(lit(1)).as("n"))
      val batch = graft.operators.Funnel.transitionMatrix(
          spark.read.parquet(s"$dir/events.parquet"))
        .select($"prev_type", $"next_type", $"n")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streamed pairs must aggregate to exactly the batch transition matrix")
      // state is ONE record per user: total pairs == events - distinct users
      val nEvents = all.length.toLong
      val nUsers = all.map(_.user_id).distinct.length.toLong
      assert(spark.table("trans_out").count() == nEvents - nUsers,
        "every event except each user's first forms exactly one pair")
    } finally q.stop()
  }

  test("streaming paths over event-time-split batches == batch trigrams (window spans boundaries)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.TransEvent
    val all = spark.read.parquet(s"$dir/events.parquet")
      .select($"user_id", $"ts".cast("timestamp").as("ts"), $"event_id", $"event_type")
      .as[TransEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val events = MemoryStream[TransEvent]
    val q = EventStreams.pathStream(events.toDS(), depth = 3)
      .writeStream.outputMode("append").format("memory").queryName("path_out").start()
    try {
      val (b1, rest) = all.splitAt(all.length / 4)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b => events.addData(b.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("path_out")
        .groupBy($"path").agg(count(lit(1)).as("n"))
      // batch twin: same window/lag trigram formation over the full table
      val batch = graft.operators.Funnel.topPaths(
          spark.read.parquet(s"$dir/events.parquet"), depth = 3, k = Int.MaxValue)
        .select($"path", $"n")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streamed paths must aggregate to exactly the batch trigram counts")
      // state is a (depth-1)-window: paths == events - 2*users (each user's
      // first two events complete no trigram)
      val nEvents = all.length.toLong
      val nUsers = all.map(_.user_id).distinct.length.toLong
      assert(spark.table("path_out").count() == nEvents - 2 * nUsers)
    } finally q.stop()
  }

  test("transition stream inactivity TTL: an idle user's state drops (boundary pair lost " +
      "by design); without the TTL it survives unchanged") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.TransEvent
    def pairsForUser1(ttl: Option[Long], name: String): Long = {
      val events = MemoryStream[TransEvent]
      val q = EventStreams.transitionStream(events.toDS(), ttl)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      // with ProcessingTimeTimeout the engine runs EMPTY batches
      // continuously to fire expired leases (shouldRunAnotherBatch is
      // unconditionally true for that mode), so `noNewData` never latches
      // and processAllAvailable() would wait forever — in TTL mode the
      // batch-committed signal has to come from the SINK instead (the
      // final batch always emits the in-batch pair b>c, the positive
      // "this batch landed" marker; memory-sink commits are atomic per
      // batch, so once it shows, the boundary-pair question is settled)
      def settle(): Unit = if (ttl.isEmpty) q.processAllAvailable()
      def n(): Long = spark.table(name).where($"user_id" === 1L).count()
      // deterministic barrier for TTL mode: the state-row total in the
      // query progress shows user 1's lease being REGISTERED (>=1) and
      // then EXPIRED (0) by the continuous empty batches — no sleep-based
      // guess about when the first batch ran (events coalescing into one
      // batch would keep the state alive and flake the assertion)
      def awaitState(pred: Long => Boolean, what: String): Unit = {
        val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
        def rows = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators).map(_.numRowsTotal).sum
        while (!pred(rows) && System.nanoTime < deadline) Thread.sleep(25)
        assert(pred(rows), s"state never became $what")
      }
      try {
        val t = new Timestamp(0L)
        events.addData(Seq(TransEvent(1L, t, 1L, "a"))); settle()
        if (ttl.isDefined) {
          awaitState(_ >= 1, "registered") // batch 1 processed, lease armed
          awaitState(_ == 0, "expired")    // empty batches fired the timeout
        }
        events.addData(Seq(TransEvent(2L, t, 2L, "x"))); settle()
        events.addData(Seq(
          TransEvent(1L, t, 3L, "b"), TransEvent(1L, t, 4L, "c")))
        settle()
        val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
        while (n() == 0 && System.nanoTime < deadline) Thread.sleep(50)
        n()
      } finally q.stop()
    }
    assert(pairsForUser1(None, "ttl_off_out") == 2L,
      "without a TTL the carried state forms the boundary pair a>b, plus the in-batch b>c")
    assert(pairsForUser1(Some(1L), "ttl_on_out") == 1L,
      "with an expired TTL the carried state is dropped (a>b lost) — the documented trade; " +
        "only the in-batch pair b>c survives")
  }

  test("stream-stream attribution join == batch twin on the same data") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + m * 60000L)
    val rows = Seq(
      (1L, 7L, ts(0), 0.0, "click"),
      (2L, 7L, ts(10), 25.0, "purchase"),  // inside 30-min window of click 1
      (3L, 7L, ts(50), 30.0, "purchase"),  // outside
      (4L, 8L, ts(5), 0.0, "click"),
      (5L, 9L, ts(6), 40.0, "purchase"))   // different user
    val clicks = MemoryStream[(Long, Long, Timestamp, Double, String)]
    val purchases = MemoryStream[(Long, Long, Timestamp, Double, String)]
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "user_id", "ts", "value", "event_type")
    val q = graft.streaming.EventStreams
      .attributionJoin(named(clicks.toDF()), named(purchases.toDF()))
      .writeStream.outputMode("append").format("memory").queryName("attr_out").start()
    try {
      clicks.addData(rows: _*)
      purchases.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("attr_out")
      val batch = graft.streaming.EventStreams.attributionJoin(
        named(rows.toDF()), named(rows.toDF()))
      assert(streamed.count() == 1, "only purchase 2 attributes to click 1")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream-stream join must equal the batch twin")
    } finally q.stop()
  }

  test("scd2 sink restart: checkpoint resume works and a forced replay is a no-op (exactly-once)") {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft_restart_store").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_restart_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_restart_ckpt").toString
    val store = new graft.tables.TableStore(spark, root)
    val schema = StructType(Seq(
      StructField("cust_id", IntegerType), StructField("name", StringType),
      StructField("balance", DoubleType)))
    val table = "silver.customers_restart"

    def startQ() = graft.streaming.StreamingUpsert.scd2Sink(
        spark.readStream.schema(schema).parquet(srcDir),
        store, table, Seq("cust_id"),
        batchId => lit(s"2024-01-0${batchId + 1} 00:00:00").cast("timestamp"))
      .option("checkpointLocation", ckpt)
      .start()

    def runToCompletion(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }

    Seq((1, "alice", 10.0), (2, "bob", 20.0)).toDF("cust_id", "name", "balance")
      .write.mode("append").parquet(srcDir)
    runToCompletion(startQ())

    // kill the query, land new source files, restart from the checkpoint
    Seq((1, "alice", 15.0), (3, "carol", 30.0)).toDF("cust_id", "name", "balance")
      .write.mode("append").parquet(srcDir)
    runToCompletion(startQ())

    def state() = store.read(table)
      .select($"cust_id", $"name", $"balance",
        col(graft.operators.Scd.ValidFrom).cast("string"),
        col(graft.operators.Scd.ValidTo).cast("string"))
      .as[(Int, String, Double, String, String)].collect().toSet
    val afterRestart = state()
    assert(afterRestart.size == 4, s"alice v1+v2, bob closed, carol: $afterRestart")
    assert(afterRestart.contains((1, "alice", 15.0, "2024-01-02 00:00:00", null)))
    // per-batch atomicity: each micro-batch is ONE snapshot commit (init,
    // then a single merge per batch) — no reader-visible window where a
    // key's current row is closed but its replacement not yet inserted
    assert(store.versions(table).size == 2,
      s"each micro-batch must commit exactly once, got ${store.versions(table)}")

    // force an at-least-once replay of the last micro-batch: drop its
    // commit marker so the restarted query re-runs batch 1 from the offset
    // log — the batch-id-derived timestamp + SCD2 idempotence must make the
    // replay a no-op (the exactly-once argument of the sink's scaladoc)
    val commit = java.nio.file.Paths.get(ckpt, "commits", "1")
    assert(java.nio.file.Files.deleteIfExists(commit), "commit marker for batch 1 must exist")
    // the local FS keeps a hidden checksum twin; it must go too or the
    // replayed commit write collides with it
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    runToCompletion(startQ())
    assert(state() == afterRestart, "replayed micro-batch must not change the table")
  }

  test("streaming append sink: batch id rides the commit, replays are skipped (exactly-once)") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft_ingest_store").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_ingest_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt").toString
    val store = new graft.tables.TableStore(spark, root)
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType)))
    val table = "bronze.ingest"

    def startQ() = graft.streaming.StreamingIngest.appendSink(
        spark.readStream.schema(schema).parquet(srcDir), store, table)
      .option("checkpointLocation", ckpt)
      .start()
    def runToCompletion(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }

    Seq((1, "a"), (2, "b")).toDF("id", "v").write.mode("append").parquet(srcDir)
    runToCompletion(startQ())
    Seq((3, "c")).toDF("id", "v").write.mode("append").parquet(srcDir)
    runToCompletion(startQ())
    assert(store.read(table).count() == 3)
    assert(store.lastStreamBatch(table).contains(1L))

    // force an at-least-once replay of the last micro-batch: the batch id
    // recorded in the table's own commit makes the duplicate delivery a
    // detected no-op
    val commit = java.nio.file.Paths.get(ckpt, "commits", "1")
    assert(java.nio.file.Files.deleteIfExists(commit))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    runToCompletion(startQ())
    assert(store.read(table).count() == 3, "replayed micro-batch duplicated rows")

    // driving the batch function directly: stale and fresh ids
    graft.streaming.StreamingIngest.appendBatch(store, table)(
      Seq((9, "dup")).toDF("id", "v"), 0L) // stale id → skipped
    assert(store.read(table).count() == 3)
    graft.streaming.StreamingIngest.appendBatch(store, table)(
      Seq((4, "d")).toDF("id", "v"), 2L) // fresh id → committed
    assert(store.read(table).count() == 4)
    assert(store.lastStreamBatch(table).contains(2L))
    store.detach()
  }

  test("gated streaming ingest: kept+quarantine partition each batch atomically, replays skip whole") {
    import graft.operators.Expectations.{Expectation => E}
    val root = java.nio.file.Files.createTempDirectory("graft_gate_store").toString
    val store = new graft.tables.TableStore(spark, root)
    val gates = Seq(E("pos", col("v") > 0, "drop"), E("small", col("v") < 100, "drop"))
    def gb = graft.streaming.StreamingIngest.gatedAppendBatch(
      store, "silver.t", "quality.q", gates) _

    gb(Seq((1, 5), (2, -1), (3, 500)).toDF("id", "v"), 0L)
    gb(Seq((4, 7), (5, -2)).toDF("id", "v"), 1L)
    assert(store.read("silver.t").select("id").as[Int].collect().sorted.toSeq == Seq(1, 4))
    val q = store.read("quality.q")
    assert(q.count() == 3)
    // reasons name exactly the violated gates; batch ids recorded
    assert(q.filter(col("id") === 2 &&
      array_join(col("_violations"), ",") === "pos" && col("_batch_id") === 0L).count() == 1)
    assert(q.filter(col("id") === 3 &&
      array_join(col("_violations"), ",") === "small").count() == 1)
    assert(q.filter(col("id") === 5 && col("_batch_id") === 1L).count() == 1)
    // replay of either batch is skipped whole — neither table moves
    gb(Seq((9, 9)).toDF("id", "v"), 1L)
    assert(store.read("silver.t").count() == 2 && store.read("quality.q").count() == 3)
    // both sides of a batch share one transactional commit: the tables'
    // stream markers advanced in lockstep
    assert(store.lastStreamBatch("silver.t").contains(1L))
    assert(store.lastStreamBatch("quality.q").contains(1L))
    store.detach()
  }

  test("quarantine replay: admitted rows move to silver atomically, the rest re-flag") {
    import graft.operators.Expectations
    import graft.operators.Expectations.{Expectation => E}
    val root = java.nio.file.Files.createTempDirectory("graft_replay_store").toString
    val store = new graft.tables.TableStore(spark, root)
    def gates(cap: Int) = Seq(E("small", col("v") <= cap, "drop"),
      E("pos", col("v") > 0, "drop"))
    graft.streaming.StreamingIngest.gatedAppendBatch(
      store, "silver.t", "quality.q",
      gates(10))(Seq((1, 5), (2, 15), (3, 50), (4, -1)).toDF("id", "v"), 0L)
    assert(store.read("silver.t").count() == 1) // only id=1
    Expectations.reprocessQuarantine(store, "silver.t", "quality.q", gates(20))
    // id=2 admitted by the relaxed cap; 3 and 4 stay with fresh reasons
    assert(store.read("silver.t").select("id").as[Int].collect().sorted.toSeq == Seq(1, 2))
    val q = store.read("quality.q")
    assert(q.select("id").as[Int].collect().sorted.toSeq == Seq(3, 4))
    assert(q.filter(col("id") === 3 &&
      array_join(col("_violations"), ",") === "small").count() == 1)
    assert(q.filter(col("id") === 4 &&
      array_join(col("_violations"), ",") === "pos").count() == 1)
    // silver and quarantine always partition the full load: no row lost,
    // none duplicated across the move
    assert(store.read("silver.t").count() + q.count() == 4)
    // arrival batch ids survive the replay on the rows that stayed
    assert(q.filter(col("_batch_id") =!= 0L).count() == 0)
    store.detach()
  }

  test("streaming minhash dedup == batch first-seen dedup; replayed batch is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft_sdedup_store").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sdedup_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sdedup_ckpt").toString
    val store = new graft.tables.TableStore(spark, root)
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select($"doc_id", $"text", $"lang")
      val schema = docs.schema

      def startQ() = graft.streaming.StreamingDedup.minhashDedupSink(
          spark.readStream.schema(schema).parquet(srcDir),
          store, "bronze.docs_kept", "bronze.doc_sigs")
        .option("checkpointLocation", ckpt)
        .start()
      def runToCompletion(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
        try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }

      // three id-ordered slices arrive as separate micro-batches
      val cut1 = 150L; val cut2 = 300L
      docs.filter($"doc_id" < cut1).write.mode("append").parquet(srcDir)
      runToCompletion(startQ())
      docs.filter($"doc_id" >= cut1 && $"doc_id" < cut2).write.mode("append").parquet(srcDir)
      docs.filter($"doc_id" >= cut2).write.mode("append").parquet(srcDir)
      runToCompletion(startQ())

      val streamed = store.read("bronze.docs_kept")
      val batchTwin = graft.operators.Dedup.firstSeenDedup(docs, "doc_id", "text")
      assert(streamed.count() > 0 && streamed.count() < docs.count(),
        "some documents deduplicated, some kept")
      assert(streamed.exceptAll(batchTwin).isEmpty && batchTwin.exceptAll(streamed).isEmpty,
        "kept set must be independent of micro-batch boundaries")

      // force an at-least-once replay of the final micro-batch: the
      // insert-only merges must re-derive identical rows and insert nothing
      val lastBatch = java.nio.file.Files.list(java.nio.file.Paths.get(ckpt, "commits"))
        .iterator().asScala.map(_.getFileName.toString).filterNot(_.startsWith("."))
        .map(_.toInt).max
      java.nio.file.Files.delete(java.nio.file.Paths.get(ckpt, "commits", s"$lastBatch"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(ckpt, "commits", s".$lastBatch.crc"))
      runToCompletion(startQ())
      val replayed = store.read("bronze.docs_kept")
      assert(replayed.exceptAll(streamed).isEmpty && streamed.exceptAll(replayed).isEmpty,
        "replayed micro-batch must not change the kept table")

      // harshest at-least-once case: the checkpoint is LOST entirely and
      // every source file re-delivers as one giant batch 0 — the
      // insert-only merges find every (doc,band,key) / doc already present
      // and the kept/sig tables stay physically identical (no file added)
      val keptFiles = store.prunedFileList("bronze.docs_kept", None).toSet
      val sigRows = store.read("bronze.doc_sigs").count()
      val ckpt2 = java.nio.file.Files.createTempDirectory("graft_sdedup_ckpt2").toString
      runToCompletion(graft.streaming.StreamingDedup.minhashDedupSink(
          spark.readStream.schema(schema).parquet(srcDir),
          store, "bronze.docs_kept", "bronze.doc_sigs")
        .option("checkpointLocation", ckpt2).start())
      assert(store.prunedFileList("bronze.docs_kept", None).toSet == keptFiles,
        "full re-delivery must not add or rewrite kept files")
      assert(store.read("bronze.doc_sigs").count() == sigRows,
        "full re-delivery must not grow the signature store")
      val redelivered = store.read("bronze.docs_kept")
      assert(redelivered.exceptAll(streamed).isEmpty && streamed.exceptAll(redelivered).isEmpty)
    } finally store.detach()
  }

  test("streaming SCD2 upsert sink: micro-batches merge into the table store") {
    import org.apache.spark.sql.functions.lit
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_stream_store").toString
    val store = new graft.tables.TableStore(spark, root)
    val updates = MemoryStream[(Int, String, Double)]
    val df = updates.toDF().toDF("cust_id", "name", "balance")
    val q = graft.streaming.StreamingUpsert.scd2Sink(
        df, store, "silver.customers", Seq("cust_id"),
        batchId => lit(s"2024-01-0${batchId + 1} 00:00:00").cast("timestamp"))
      .start()
    try {
      updates.addData((1, "alice", 10.0), (2, "bob", 20.0))
      q.processAllAvailable()
      updates.addData((1, "alice", 15.0), (3, "carol", 30.0))
      q.processAllAvailable()
      val out = store.read("silver.customers")
      assert(out.count() == 4,
        "alice v1 (closed) + alice v2 (current) + bob (closed) + carol (current)")
      import org.apache.spark.sql.functions.col
      val current = out.filter(col(graft.operators.Scd.ValidTo).isNull)
      val currentMap = current.select("cust_id", "balance")
        .as[(Int, Double)].collect().toMap
      assert(currentMap == Map(1 -> 15.0, 3 -> 30.0),
        s"batch 2 omitted bob => bob closed (delete semantics); got $currentMap")
      val closed = out.filter(col(graft.operators.Scd.ValidTo).isNotNull)
        .select("cust_id").as[Int].collect().sorted
      assert(closed.toSeq == Seq(1, 2), "alice v1 closed by update, bob closed by delete")
    } finally q.stop()
  }

  test("streaming drift monitor: first batch seeds silently, later batches report BEFORE " +
      "absorbing, replays and half-replays are exactly-once") {
    import org.apache.spark.sql.functions.{col, lit}
    val root = java.nio.file.Files.createTempDirectory("graft_drift_store").toString
    val store = new graft.tables.TableStore(spark, root)
    val drift = graft.streaming.StreamingDrift
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    val run = drift.driftBatch(store, "mon.profile", "mon.drift", "text", 10) _
    def profile = store.read("mon.profile").as[(String, Long)].collect().toMap

    // batch 0 seeds the profile; nothing to drift from yet
    run(docs((1L, "alpha beta beta")), 0L)
    assert(profile == Map("alpha" -> 1L, "beta" -> 2L))
    assert(!store.exists("mon.drift"), "first batch must not report")

    // batch 1 reports against the batch-0 profile, THEN absorbs
    run(docs((2L, "alpha gamma")), 1L)
    val rep1 = store.read("mon.drift").collect()
    assert(rep1.length == 3 && rep1.forall(_.getAs[Long]("batch_id") == 1L))
    val gamma = rep1.find(_.getAs[String]("term") == "gamma").get
    assert(gamma.getAs[Long]("c_profile") == 0L && gamma.getAs[Long]("c_batch") == 1L)
    assert(gamma.getAs[Long]("p_batch_micro") == 500000L,
      "batch rate must be computed against the batch total (1 of 2 tokens)")
    val beta = rep1.find(_.getAs[String]("term") == "beta").get
    assert(beta.getAs[Long]("p_profile_micro") == 666666L,
      "profile rate must predate the batch's own absorb (2 of 3 tokens)")
    assert(profile == Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L))

    // full replay of batch 1: both commits carry id 1 → detected no-op
    run(docs((2L, "alpha gamma")), 1L)
    assert(store.read("mon.drift").count() == 3, "replay duplicated the report")
    assert(profile == Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L),
      "replay double-absorbed the profile")

    // half-replay (crash between the two commits): the id-2 report is
    // already committed but the merge was lost — the redelivered batch
    // must skip the report and complete ONLY the absorb
    val b2 = docs((3L, "delta"))
    store.append("mon.drift",
      drift.compareToProfile(store.read("mon.profile"),
          drift.unigramCounts(b2, "text"), 10)
        .withColumn("batch_id", lit(2L)),
      op = "stream_append:2")
    val reportsBefore = store.read("mon.drift").count()
    run(b2, 2L)
    assert(store.read("mon.drift").count() == reportsBefore,
      "half-replay re-wrote the already-committed report")
    assert(profile == Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L, "delta" -> 1L),
      "half-replay must still complete the lost absorb")
    assert(store.read("mon.drift").filter(col("batch_id") === 2L).count() > 0)

    // an empty micro-batch (recovery, or whitespace-only docs) leaves no
    // trace: no null-metric report rows, no profile change, and no label
    // advance (batch 4 after an empty batch 3 still reports normally)
    val reports3 = store.read("mon.drift").count()
    run(docs(), 3L)
    run(docs((4L, "   ")), 3L)
    assert(store.read("mon.drift").count() == reports3,
      "an empty batch must not append a report")
    assert(profile == Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L, "delta" -> 1L),
      "an empty batch must not touch the profile")
    run(docs((5L, "epsilon")), 4L)
    assert(store.read("mon.drift").filter(col("batch_id") === 4L).count() > 0,
      "the batch after an empty one must still report")
    store.detach()
    graft.queries.Scratch.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("streaming minhash dedup: REVERSED arrival order still converges to the batch twin") {
    // ids arrive largest-first (retries / multi-producer upstreams), so a
    // larger-id near-dup is kept before its smaller-id winner arrives —
    // the sink must RETRACT it when the winner lands, or the kept set
    // depends on micro-batch boundaries
    val root = java.nio.file.Files.createTempDirectory("graft_sdedup_rev").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sdedup_rsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sdedup_rck").toString
    val store = new graft.tables.TableStore(spark, root)
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select($"doc_id", $"text", $"lang")
      val schema = docs.schema
      def runToCompletion(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
        try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
      def drain(): Unit = runToCompletion(
        graft.streaming.StreamingDedup.minhashDedupSink(
            spark.readStream.schema(schema).parquet(srcDir),
            store, "bronze.docs_kept", "bronze.doc_sigs")
          .option("checkpointLocation", ckpt).start())
      val cut1 = 150L; val cut2 = 300L
      docs.filter($"doc_id" >= cut2).write.mode("append").parquet(srcDir)
      drain()
      docs.filter($"doc_id" >= cut1 && $"doc_id" < cut2)
        .write.mode("append").parquet(srcDir)
      drain()
      docs.filter($"doc_id" < cut1).write.mode("append").parquet(srcDir)
      drain()
      val streamed = store.read("bronze.docs_kept")
      val batchTwin = graft.operators.Dedup.firstSeenDedup(docs, "doc_id", "text")
      assert(streamed.exceptAll(batchTwin).isEmpty &&
        batchTwin.exceptAll(streamed).isEmpty,
        "reversed arrival must converge to the batch twin via retraction")
    } finally {
      store.detach()
      graft.queries.Scratch.deleteRecursively(java.nio.file.Paths.get(root))
    }
  }

  test("sessionize: an out-of-order within-watermark event cannot regress the session end") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[SessionEvent]
    val sessions = EventStreams.sessionize(events.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_ooo").start()
    try {
      def ts(m: Int) = new Timestamp(
        Timestamp.valueOf("2024-01-01 00:00:00").getTime + m * 60000L)
      events.addData(SessionEvent(7L, ts(20), "view"))
      q.processAllAvailable() // watermark = 20 - 10 = minute 10
      // minute 12 is within the watermark: it must extend the session's
      // span backwards, not move its END back to 12 (which would make the
      // next event split the session in the wrong place)
      events.addData(SessionEvent(7L, ts(12), "click"))
      q.processAllAvailable()
      // 49 - 20 = 29 min <= 30-min gap: the session CONTINUES (a
      // regressed end of 12 would read 37 min and close it spuriously)
      events.addData(SessionEvent(7L, ts(49), "view"))
      q.processAllAvailable()
      events.addData(SessionEvent(99L, ts(600), "view"))
      q.processAllAvailable()
      events.addData(SessionEvent(99L, ts(1200), "view"))
      q.processAllAvailable()
      val out = spark.table("sessions_ooo").as[Session].collect()
        .filter(_.user_id == 7L)
      assert(out.length == 1 &&
        out(0).session_start == ts(12) && out(0).session_end == ts(49) &&
        out(0).n_events == 3L,
        s"expected one session [12, 49] x3, got: ${out.mkString("; ")}")
    } finally q.stop()
  }

  test("scd2Sink with snapshotBatches=false leaves absent keys' current rows open") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_scd2_inc").toString
    val store = new graft.tables.TableStore(spark, root)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_scd2_inc_ck").toString
    try {
      val events = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingUpsert.scd2Sink(
          events.toDF().toDF("k", "v"), store, "silver.t", Seq("k"),
          b => lit(java.sql.Timestamp.valueOf(f"2024-01-01 00:${b}%02d:00")),
          snapshotBatches = false)
        .option("checkpointLocation", ckpt).start()
      try {
        events.addData((1L, "a")) // batch with key 1 only
        q.processAllAvailable()
        events.addData((2L, "b")) // batch with key 2 only — key 1 sat out
        q.processAllAvailable()
        val current = store.read("silver.t")
          .filter(col(graft.operators.Scd.ValidTo).isNull)
          .select("k").collect().map(_.getLong(0)).toSet
        assert(current == Set(1L, 2L),
          s"an incremental batch must not close keys that sat it out, got $current")
      } finally q.stop()
    } finally {
      store.detach()
      graft.queries.Scratch.deleteRecursively(java.nio.file.Paths.get(root))
    }
  }
}
