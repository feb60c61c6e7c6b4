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
