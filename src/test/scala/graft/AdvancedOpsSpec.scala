package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, Collocations, Funnel, Salting, Sampling}

/** As-of join tie/miss semantics, salting result-parity, funnel step
  * semantics, collocation/posting-list fixtures, and weighted-sample
  * replay against a sequential reference. */
class AdvancedOpsSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  test("asof backward: inclusive ties, misses are null, latest-wins") {
    val left = Seq((1, 10L, "a"), (1, 20L, "b"), (1, 5L, "c"), (2, 50L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1, 10L, 1.0), (1, 15L, 2.0), (3, 1L, 9.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asofBackward(left, right, Seq("k"), "t", "t",
        Map("v" -> "rv"))
      .select($"tag", $"rv").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "a" -> Some(1.0),  // tie at t=10 matches (inclusive)
      "b" -> Some(2.0),  // latest of 10,15
      "c" -> None,       // nothing at or before 5
      "d" -> None))      // key 2 has no right rows
  }

  test("salted join equals plain join; hot key spread over buckets") {
    val big = spark.range(10000)
      .select((col("id") % 3).as("k"), col("id").as("v"))
    val small = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).groupBy($"name").count()
    val salted = Salting.saltedJoin(big, small, Seq("k"), buckets = 8)
      .groupBy($"name").count()
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    // salt actually spreads: distinct (k, salt) combos > distinct k
    val combos = big.withColumn("s", Salting.saltCol(8, big.columns.map(col): _*))
      .select($"k", $"s").distinct().count()
    assert(combos > 3, s"expected hot keys spread over salt buckets, got $combos combos")
  }

  test("funnel: ordered steps, strict-after, per-step window, out-of-order never counts") {
    // u1 full journey; u2 clicks only BEFORE its view; u3 purchases before
    // clicking; u4 clicks one second past the window
    val events = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 8L), (2L, "view", 10L),
      (3L, "view", 10L), (3L, "purchase", 15L), (3L, "click", 20L),
      (4L, "view", 10L), (4L, "click", 111L))
      .toDF("user_id", "event_type", "sec")
      .select($"user_id", $"event_type", $"sec".cast("timestamp").as("ts"))
    val out = Funnel.conversion(events, Seq("view", "click", "purchase"),
        windowSecs = 100L)
      .select($"step", $"step_name", $"users")
      .as[(Long, String, Long)].collect().toList
    assert(out == List((1L, "view", 4L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("bigram lift: exact integer arithmetic on a hand-computed corpus") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Collocations.bigramLift(docs, "doc_id", "text", minCount = 1, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect().toList
    // N=7 tokens; c(a)=3, c(b)=3, c(c)=1; bigrams ab×3, ba×1, bc×1
    assert(out == List(
      ("a", "b", 3L, 3L, 3L, 7L * 3 * 1000000 / 9),
      ("b", "c", 1L, 3L, 1L, 7L * 1000000 / 3),
      ("b", "a", 1L, 3L, 3L, 7L * 1000000 / 9)))
  }

  test("inverted index: postings sorted by doc, df window applied") {
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val all = Collocations.invertedIndex(docs, "doc_id", "text", minDf = 1, maxDf = 2)
      .as[(String, Long, Long, String)].collect().toList
    assert(all == List(
      ("a", 1L, 2L, "1:2"), ("b", 2L, 2L, "1:1,2:1"), ("c", 1L, 1L, "2:1")))
    val noHot = Collocations.invertedIndex(docs, "doc_id", "text", minDf = 1, maxDf = 1)
      .as[(String, Long, Long, String)].collect().toList
    assert(noHot.map(_._1) == List("a", "c"), "maxDf must drop the hot term")
  }

  test("span corruption: sentinels collapse runs, round trip reconstructs the document") {
    import graft.operators.Denoising
    val docs = Seq((1L, "w0 w1 w2 w3 w4 w5 w6 w7"), (2L, "a b")).toDF("doc_id", "text")
    val out = Denoising.spanCorruption(docs, "doc_id", "text", maskPct = 40)
      .as[(Long, Long, String, String)].collect().toList
    // replay the mask rule sequentially and rebuild both strings
    val md = java.security.MessageDigest.getInstance("MD5")
    def masked(doc: Long, pos: Int): Boolean = {
      val hex = md.digest(s"mask|$doc|$pos".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 100 < 40
    }
    val want = Seq((1L, "w0 w1 w2 w3 w4 w5 w6 w7"), (2L, "a b")).map { case (id, text) =>
      val toks = text.split(" ")
      val flags = toks.indices.map(masked(id, _))
      var span = 0
      val in = new StringBuilder; val tg = new StringBuilder
      toks.indices.foreach { i =>
        val start = flags(i) && (i == 0 || !flags(i - 1))
        if (start) span += 1
        val sep = (sb: StringBuilder) => if (sb.nonEmpty) sb.append(' ')
        if (!flags(i)) { sep(in); in.append(toks(i)) }
        else {
          if (start) { sep(in); in.append(s"<extra_id_${span - 1}>")
            sep(tg); tg.append(s"<extra_id_${span - 1}>") }
          sep(tg); tg.append(toks(i))
        }
      }
      (id, span.toLong, in.toString, tg.toString)
    }.toList
    assert(out == want)
    // every example must actually mask something OR pass through verbatim
    out.zip(want).foreach { case ((_, n, in, tg), _) =>
      if (n == 0) assert(tg.isEmpty && !in.contains("<extra_id_"))
      else assert(in.contains("<extra_id_0>") && tg.contains("<extra_id_0>"))
    }
  }

  test("weighted sample: equals a sequential replay of the hash-priority race") {
    val rows = (1L to 200L).map(i => (i, (i % 7) + 1L))
    val df = rows.toDF("doc_id", "w")
    val got = Sampling.weightedPriority(df, "doc_id", "w", k = 20)
      .as[(Long, Long, Long)].collect().toList
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): Long = {
      val hex = md.digest(s"wps|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = rows.map { case (id, w) => (id, w, h(id) * 1000000L / w) }
      .sortBy { case (id, _, p) => (p, id) }.take(20).toList
    assert(got == want)
  }
}
