package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.syntax._
import graft.operators.Merge

/** The façade surface: fluent merge builder semantics and DataFrame syntax. */
class SyntaxSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  test("fluent merge builder: full clause surface, first-match-wins") {
    val target = Seq((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)).toDF("id", "tag", "v")
    val source = Seq((1, "A", 10.0), (4, "d", 4.0)).toDF("id", "tag", "v")
    val out = Merge.into(target).using(source).on(Seq("id"))
      .whenMatched(col("s.v") > 5.0).update(Map("v" -> col("s.v"), "tag" -> col("s.tag")))
      .whenMatched().delete()
      .whenNotMatched().insert(Map("id" -> col("s.id"), "tag" -> col("s.tag"), "v" -> col("s.v")))
      .whenNotMatchedBySource(col("t.id") === 3).delete()
      .merge()
      .as[(Int, String, Double)].collect().sortBy(_._1)
    // id=1 matched & s.v>5 → updated; id=2 untouched by source → kept (cond id===3 only);
    // id=3 deleted by source-absence clause; id=4 inserted
    assert(out.toSeq == Seq((1, "A", 10.0), (2, "b", 2.0), (4, "d", 4.0)))
  }

  test("syntax: scd2 + dedup + topk via DataFrame methods") {
    val src = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val state = src.scd2Init(lit("2024-01-01 00:00:00"))
      .scd2Merge(Seq((1, "x2"), (2, "y")).toDF("k", "v"), Seq("k"), lit("2024-02-01 00:00:00"))
    assert(state.count() == 3)

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(docs.dedupExact("doc_id", "text").count() > 0)

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val topk = emb.cosineTopK(emb.filter($"vec_id" < 2), k = 3)
    assert(topk.groupBy($"query_id").count().filter($"count" =!= 3).count() == 0)
  }
}
