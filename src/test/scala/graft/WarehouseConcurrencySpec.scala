package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tables.TableStore

/** The SQL warehouse surface under real multi-session contention: N
  * concurrent "sessions" (threads sharing the SparkSession, each issuing
  * independent `spark.sql` statements — the serverless-warehouse usage
  * shape, reference README.md:143-161) run mixed SELECT / UPDATE / INSERT
  * / MERGE against the same store tables while a streaming ingest commits
  * to a sibling table. Pins the optimistic-concurrency story end to end:
  * CAS commits serialize conflicting writers (losers retry, nobody
  * clobbers), staged manifests keep readers on committed snapshots, and
  * the streaming sink's commits interleave without torn state. */
class WarehouseConcurrencySpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  test("concurrent SQL sessions + streaming ingest: no lost updates, no torn reads") {
    val root = Files.createTempDirectory("graft_whconc").toString
    val store = new TableStore(spark, root)
    try {
      val threads = 4
      val iters = 6
      // one counter row per session thread; updates contend on the TABLE
      // (single commit pointer) even though keys are disjoint
      store.createOrReplace("wh.counters",
        (0 until threads).map(t => (t.toLong, 0L)).toDF("k", "n"))
      store.createOrReplace("wh.audit",
        Seq.empty[(Long, Long)].toDF("k", "seq"))

      // streaming ingest runs THROUGHOUT: micro-batches append to a
      // sibling table via the exactly-once batch-id gate
      val src = Files.createTempDirectory("graft_whconc_src").toString
      val ckpt = Files.createTempDirectory("graft_whconc_ck").toString
      spark.range(0, 10).select(col("id"), lit("seed").as("v"))
        .write.mode("append").parquet(src)
      val stream = graft.streaming.StreamingIngest.appendSink(
        spark.readStream.schema(
          spark.read.parquet(src).schema).parquet(src),
        store, "wh.events")
      val q = stream.option("checkpointLocation", ckpt).start()

      def retrying(body: => Unit): Unit = {
        var done = false
        while (!done) {
          try { body; done = true }
          catch { case _: java.util.ConcurrentModificationException => Thread.sleep(5) }
        }
      }
      val torn = new ConcurrentLinkedQueue[String]()
      // plain-parquet appends to ONE directory share a _temporary/0
      // committer dir — concurrent jobs clobber each other's task files
      // (a Spark FileOutputCommitter limitation, not store behavior).
      // The feed only needs data flowing, so serialize it; the DML
      // statements stay fully concurrent.
      val feedLock = new Object
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val work = (0 until threads).map { t => Future {
        (1 to iters).foreach { i =>
          // lost-update probe: read-modify-write via SQL UPDATE, retried
          retrying(spark.sql(s"UPDATE wh.counters SET n = n + 1 WHERE k = $t"))
          // audit insert (append-only, conflict-free by design)
          retrying(spark.sql(s"INSERT INTO wh.audit VALUES (CAST($t AS BIGINT), CAST($i AS BIGINT))"))
          // MERGE upsert into the shared counters table (touches own key)
          retrying(spark.sql(
            s"""MERGE INTO wh.counters tgt
               |USING (SELECT CAST($t AS BIGINT) AS k) src ON tgt.k = src.k
               |WHEN NOT MATCHED THEN INSERT (k, n) VALUES (src.k, 0)""".stripMargin))
          // torn-read probe: a snapshot read must always see an integral
          // state — counter values in [0, iters], audit rows unique
          val snap = spark.sql("SELECT k, n FROM wh.counters").collect()
          if (snap.exists(r => r.getLong(1) < 0 || r.getLong(1) > iters))
            torn.add(s"impossible counter state: ${snap.mkString(",")}")
          // feed the stream a little more while DML churns
          feedLock.synchronized {
            spark.range(i * 100 + t * 10, i * 100 + t * 10 + 2)
              .select(col("id"), lit(s"t$t-$i").as("v"))
              .write.mode("append").parquet(src)
          }
        }
      }}
      Await.result(Future.sequence(work), Duration.Inf)
      q.processAllAvailable(); q.stop(); q.awaitTermination()

      assert(torn.isEmpty, s"torn reads observed: ${torn.toArray.mkString("; ")}")
      // no lost updates: every thread's counter reached exactly `iters`
      val counters = store.read("wh.counters").as[(Long, Long)].collect().toMap
      assert((0 until threads).forall(t => counters(t.toLong) == iters.toLong),
        s"lost updates under contention: $counters")
      // every audit insert landed exactly once
      val audit = store.read("wh.audit").as[(Long, Long)].collect()
      assert(audit.length == threads * iters && audit.distinct.length == audit.length,
        s"audit rows lost or duplicated: ${audit.length}")
      // the streaming table saw every appended source row exactly once
      val expected = spark.read.parquet(src).count()
      assert(store.read("wh.events").count() == expected,
        "streaming ingest lost or duplicated rows under concurrent DML")
    } finally store.detach()
  }
}
