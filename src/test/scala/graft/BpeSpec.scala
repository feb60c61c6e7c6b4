package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe
import graft.operators.Bpe.Merge

/** BPE training semantics pinned against a hand-computed corpus: merge
  * order, tie-breaking, greedy left-to-right (non-overlapping) merge
  * application, early exhaustion, and the fertility-encode arithmetic. */
class BpeSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  // corpus: "aaab" ×3, "aab" ×2 (as two docs so doc grouping is exercised)
  private def tiny = Seq(
    (1L, "aaab aaab aab"),
    (2L, "aaab aab")).toDF("doc_id", "text")

  test("learnMerges reproduces the hand-computed merge table (incl. tie-break)") {
    // round 1: (a,a)=8 beats (a,b)=5
    // round 2: after |aa||a||b| / |aa||b|: (aa,a)=3 TIES (a,b)=3 → lhs
    //          order picks (a,b)
    // round 3: (aa,ab)=3 beats (aa,b)=2; round 4: (aa,b)=2
    // round 5: every word is one symbol → exhausted before rounds=6
    val merges = Bpe.learnMerges(tiny, rounds = 6)
    assert(merges == Seq(
      Merge(1, "a", "a", "aa", 8L),
      Merge(2, "a", "b", "ab", 3L),
      Merge(3, "aa", "ab", "aaab", 3L),
      Merge(4, "aa", "b", "aab", 2L)))
  }

  test("merge application is greedy left-to-right: aaa + (a,a) → [aa, a]") {
    val df = Seq("aaa").toDF("w")
      .select(Bpe.applyMerges(Bpe.delimited($"w"),
        Seq(Merge(1, "a", "a", "aa", 0L))).as("s"))
    assert(df.head().getString(0) == "|aa||a|")
  }

  test("a merged symbol never matches across its own boundary") {
    // (a,b) then (b,a): "abab" → [ab, ab]; the second merge must not see a
    // (b,a) pair inside the fused "ab" symbols
    val df = Seq("abab").toDF("w")
      .select(Bpe.applyMerges(Bpe.delimited($"w"),
        Seq(Merge(1, "a", "b", "ab", 0L), Merge(2, "b", "a", "ba", 0L))).as("s"))
    assert(df.head().getString(0) == "|ab||ab|")
  }

  test("subwordStats: per-doc fertility under a 2-merge table") {
    // merges (a,a),(a,b): aaab → [aa, ab] (2), aab → [aa, b] (2)
    val m = Bpe.learnMerges(tiny, rounds = 2)
    val stats = Bpe.subwordStats(tiny, m).orderBy($"doc_id")
      .as[(Long, Long, Long)].collect()
    assert(stats.toSeq == Seq((1L, 3L, 6L), (2L, 2L, 4L)))
  }

  test("non-[a-z]+ tokens never train or count; wordless docs drop out") {
    val df = Seq((1L, "Abc a1 ? aaab"), (2L, "123 ///")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(df, rounds = 1)
    assert(m == Seq(Merge(1, "a", "a", "aa", 2L)))
    val stats = Bpe.subwordStats(df, m).as[(Long, Long, Long)].collect()
    assert(stats.toSeq == Seq((1L, 1L, 3L))) // aaab → [aa, a, b]
  }

  test("batched learning: batch=1 is exact; batched passes accept only symbol-disjoint pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Bpe.learnMerges(docs, rounds = 6)
    assert(Bpe.learnMerges(docs, rounds = 6, batch = 1) == exact)
    val batched = Bpe.learnMerges(docs, rounds = 12, batch = 4)
    assert(batched.length == 12)
    assert(batched.map(_.rank) == (1 to 12))
    // within each 4-merge pass, no symbol may repeat across accepted pairs
    // (sides or fused results) — that is what makes the pass's chained
    // application order-independent
    batched.grouped(4).foreach { pass =>
      val syms = pass.flatMap(m => Seq(m.lhs, m.rhs, m.merged))
      assert(syms.distinct.length == syms.length, s"conflicting pass: $pass")
    }
    // the batched table's FIRST pick of each pass matches exact-BPE's pick
    // under the same accumulated state only for the first pass; globally it
    // is an approximation — but it must still encode: fertility is sane
    val stats = Bpe.subwordStats(docs, batched)
    assert(stats.filter(col("n_subwords") < col("n_words")).count() == 0,
      "a word is never fewer than one subword")
  }

  test("applyMergesBounded segments match the raw chain exactly") {
    val merges = Seq(
      Merge(1, "a", "a", "aa", 0L), Merge(2, "a", "b", "ab", 0L),
      Merge(3, "aa", "ab", "aaab", 0L), Merge(4, "b", "a", "ba", 0L),
      Merge(5, "aa", "b", "aab", 0L))
    val df = Seq("aaab", "aab", "baba", "abba", "aaaab")
      .toDF("w").select($"w", Bpe.delimited($"w").as("s"))
    val raw = df.select($"w", Bpe.applyMerges($"s", merges).as("s"))
      .as[(String, String)].collect().sortBy(_._1)
    // segment=2 forces two localCheckpoint boundaries inside the table
    val seg = Bpe.applyMergesBounded(df, "s", merges, segment = 2)
      .as[(String, String)].collect().sortBy(_._1)
    assert(seg.toSeq == raw.toSeq)
  }

  test("512-merge vocabulary: learning completes and every encode segment stays codegen-compilable") {
    // synthetic corpus: enough distinct adjacent pairs to accept 512
    // merges (4k random 8-char words over a-z)
    val rnd = new scala.util.Random(42)
    val words = Vector.fill(4000)((0 until 8)
      .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val docs = words.grouped(50).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, rounds = 512, batch = 64)
    assert(merges.length == 512, s"expected 512 merges, got ${merges.length}")
    assert(merges.map(_.rank) == (1 to 512))

    // a full-Segment encode projection must compile inside whole-stage
    // codegen with every generated method under the JIT huge-method limit
    // (8000 bytecode bytes) — i.e. no silent interpreted fallback and no
    // JIT bailout on the hot path
    import org.apache.spark.sql.execution.debug.codegenStringSeq
    val segDf = docs.select(explode(split($"text", " ")).as("w")).distinct()
      .select(Bpe.delimited($"w").as("s"))
      .select(Bpe.applyMerges($"s", merges.take(Bpe.Segment)).as("s"))
    segDf.collect() // finalize the adaptive plan
    val plan = segDf.queryExecution.executedPlan
    assert("\\*\\(\\d+\\) ".r.findFirstIn(plan.toString).isDefined,
      "encode segment must plan as whole-stage codegen")
    val stats = codegenStringSeq(plan)
    assert(stats.nonEmpty)
    stats.foreach { case (_, _, bc) =>
      assert(bc.maxMethodCodeSize > 0 && bc.maxMethodCodeSize < 8000,
        s"a $bc-sized method would bail out of JIT / fall back interpreted")
    }

    // and the bounded full-table encode agrees with fertility invariants
    val fert = Bpe.subwordStats(docs, merges)
    assert(fert.filter($"n_subwords" < $"n_words").count() == 0)
    assert(fert.filter($"n_subwords" > $"n_words" * 8).count() == 0)
  }

  test("learning is deterministic on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bpe.learnMerges(docs, rounds = 3)
    val b = Bpe.learnMerges(docs, rounds = 3)
    assert(a == b && a.length == 3)
    assert(a.forall(_.pairCount > 0))
  }

  test("per-source fertility (x120) reconciles with the per-doc stats and stays bounded") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r = graft.queries.BpeQueries.x120TokenizerFertility(spark, "/root/testdata/sf0.001")
      .cache()
    // a word is at least one subword, so fertility_micro >= 1e6; and a
    // subword is at least one char, so it is bounded by chars-per-word
    assert(r.filter($"fertility_micro" < 1000000L).count() == 0)
    assert(r.filter($"n_subwords" < $"n_words").count() == 0)
    // the rollup must equal x76's per-doc stats summed by source
    val perDoc = graft.queries.BpeQueries.x76BpeEncode(spark, "/root/testdata/sf0.001")
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .groupBy($"source")
      .agg(org.apache.spark.sql.functions.sum($"n_words").as("w"),
        org.apache.spark.sql.functions.sum($"n_subwords").as("s"))
    val bad = r.join(perDoc, "source")
      .filter($"n_words" =!= $"w" || $"n_subwords" =!= $"s").count()
    r.unpersist(false)
    assert(bad == 0, "x120 must be exactly x76 rolled up by source")
  }

  test("incremental fertility (x121) converges bit-for-bit to the one-shot x120") {
    // the incremental twin's contract: 3 batches merged under the frozen
    // merge table accumulate to EXACTLY the one-shot report — same rows,
    // same sums, same micro-unit fertility
    val dir = "/root/testdata/sf0.001"
    val inc = graft.queries.BpeQueries.x121IncrementalFertility(spark, dir)
      .collect().toSeq
    val one = graft.queries.BpeQueries.x120TokenizerFertility(spark, dir)
      .collect().toSeq
    assert(inc == one, s"incremental != one-shot:\n$inc\nvs\n$one")
  }
}
