package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Materialize

/** The reliable-checkpoint opt-in for iterative operators: setting
  * `spark.graft.checkpointDir` on the session flips every loop
  * materialization from localCheckpoint (executor-storage blocks — lost
  * with an executor) to a reliable `checkpoint()` into that directory, so
  * pageRank / dupClusters / incremental indexes survive executor loss on a
  * real cluster. Results must be bit-identical in both modes — the switch
  * only changes WHERE loop state is materialized, never semantics. */
class CheckpointModeSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  /** Run `body` with reliable checkpointing enabled, restoring the
    * session to local mode after (suites share the session). */
  private def withReliable[A](body: String => A): A = {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Materialize.DirKey, dir)
    try body(dir)
    finally spark.conf.unset(Materialize.DirKey)
  }

  test("Materialize routes to a reliable checkpoint when the dir is set") {
    val df = Seq(1, 2, 3).toDF("x")
    withReliable { dir =>
      val m = Materialize(df)
      assert(m.as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(
          new java.io.File(dir).getName)),
        "sparkContext checkpoint dir must point into the opt-in directory")
      // reliable checkpoints materialize as rdd-N subdirectories
      val files = Files.walk(java.nio.file.Paths.get(dir)).count()
      assert(files > 1, "checkpoint files must land in the opt-in dir")
    }
  }

  test("dupClusters: reliable-checkpoint run is identical to the local run") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text",
      threshold = 0.5)
    def clusters() = graft.operators.Dedup
      .dupClusters(docs.select($"doc_id"), pairs, "doc_id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val local = clusters()
    val reliable = withReliable(_ => clusters())
    assert(reliable == local)
    assert(local.nonEmpty)
  }

  test("reliable mode: superseded loop checkpoints are deleted and the dir is set once") {
    // a 48-hop chain drives ~6 pointer-doubling rounds in dupClusters;
    // every round checkpoints a labels table and releases its predecessor
    val chain = (1L until 49L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ids = spark.range(1, 50).toDF("doc_id")
    withReliable { dir =>
      val out = graft.operators.Dedup.dupClusters(ids, chain, "doc_id")
        .as[(Long, Long)].collect()
      assert(out.forall(_._2 == 1L))
      val root = java.nio.file.Paths.get(dir)
      // setCheckpointDir appends ONE random UUID subdir — a second one
      // means the idempotence guard re-ran the (remote) mkdirs per round
      import scala.jdk.CollectionConverters._
      val uuidDirs = Files.list(root).iterator().asScala.toSeq
      assert(uuidDirs.size == 1,
        s"checkpoint dir must be initialized once, found ${uuidDirs.size} UUID dirs")
      // superseded ReliableCheckpointRDD directories must be DELETED, not
      // accumulate one dead labels/edges copy per round: the loop keeps
      // only the final labels checkpoint (the returned plan reads it)
      val rddDirs = Files.list(uuidDirs.head).iterator().asScala
        .filter(_.getFileName.toString.startsWith("rdd-")).toSeq
      assert(rddDirs.size <= 2,
        s"expected at most the live final checkpoint(s), found ${rddDirs.size} rdd dirs: " +
          rddDirs.map(_.getFileName).mkString(", "))
    }
  }

  test("pageRank: reliable-checkpoint run is identical to the local run") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (2L, 1L))
      .toDF("src", "dst")
    def pr() = graft.operators.Graph.pageRank(edges, iterations = 4)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val local = pr()
    val reliable = withReliable(_ => pr())
    assert(reliable == local)
    assert(local.map(_._1) == Seq(1L, 2L, 3L, 4L))
  }
}
