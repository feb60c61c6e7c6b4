package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Pins r17's §2.5 input-parallelism guard: [[Tables.fanOut]] must
  * repartition a low-split scan to session width (the single-row-group
  * bench inputs otherwise serialize every CPU-dense projection into one
  * task) and must be an exact NO-OP — same plan object, no added
  * exchange — once the input already has session-width partitions, so a
  * corpus-scale scan never pays a shuffle for it. */
class FanOutSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("a low-split scan fans out to session parallelism; rows unchanged") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    assert(docs.rdd.getNumPartitions <
      spark.sessionState.conf.numShufflePartitions,
      "fixture assumption: the testdata scan is below session width")
    val fanned = Tables.fanOut(docs, col("doc_id"))
    assert(fanned.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
    assert(fanned.count() == n, "fanOut must not change the row set")
  }

  test("an input already at session width passes through untouched (no-op at scale)") {
    val wide = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(spark.sessionState.conf.numShufflePartitions + 3, col("doc_id"))
    val out = Tables.fanOut(wide, col("doc_id"))
    assert(out eq wide, "fanOut must return the SAME frame — no exchange added")
  }

  test("keyless fanOut round-robins deterministically (row set preserved)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("text"))
    val out = Tables.fanOut(docs)
    assert(out.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
    assert(out.count() == docs.count())
  }
}
