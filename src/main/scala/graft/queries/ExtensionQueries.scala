package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Materialize.MatOps
import graft.functions.TextFunctions
import graft.functions.RollingHash.rolling_hash
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.sources.Tables.t

/** Training-data-pipeline extension surface over the `documents` /
  * `embeddings` tables: dedup family (exact, n-gram Jaccard, MinHash+LSH,
  * SimHash), similarity search, text analysis, fingerprinting, multimodal
  * features. Everything hash-deterministic (md5-derived, no RNG) so the
  * approximate operators have *exact* DuckDB oracles, not just row counts.
  */
object ExtensionQueries {

  /** The incremental-family batch fixture: a frame split into three
    * doc_id-ranged batches (thirds of the id span). ONE shared cut —
    * the split is part of several twins' oracle contracts (the batches
    * must reassemble the exact corpus), so every site must cut
    * identically, and an off-by-one fix lands everywhere at once. */
  private[queries] def thirdsByDocId(df: DataFrame): Seq[DataFrame] = {
    val r = df.agg(min(col("doc_id")).cast("long"),
      max(col("doc_id")).cast("long")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
    Seq(
      df.filter(col("doc_id") <= c1),
      df.filter(col("doc_id") > c1 && col("doc_id") <= c2),
      df.filter(col("doc_id") > c2))
  }


  // x1: exact dedup on normalized text.
  def x1DedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("text_md5"))

  // x2: exact pairwise 3-gram Jaccard near-dups (threshold 0.6).
  def x2NgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", n = 3, threshold = 0.6)
      .orderBy(col("doc_a"), col("doc_b"))

  // x3: MinHash+LSH candidate generation (4 bands × 2 rows) with exact
  // Jaccard verification of candidates.
  def x3MinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text",
        n = 3, bands = 4, rows = 2, threshold = 0.6)
      .orderBy(col("doc_a"), col("doc_b"))

  // x4: SimHash fingerprints + banded Hamming-distance pairs.
  def x4SimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxDist = 3)
      .orderBy(col("doc_a"), col("doc_b"))

  // x5: brute-force cosine top-5 for the first 10 vectors as queries.
  def x5AnnTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
      .orderBy(col("query_id"), col("rk"))
  }

  // x6: embedding near-duplicate pairs, cosine ≥ 0.45.
  def x6EmbedNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(t(s, dir, "embeddings"), threshold = 0.45)
      .orderBy(col("id_a"), col("id_b"))

  // x79: MMR diversity selection — 8 picks for query vector 0, each step
  // maximizing relevance minus max-cosine-to-already-selected. The picks
  // are collected driver-side by construction (k rows); re-lifted to a
  // DataFrame for the gate.
  def x79MmrSelect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.mmrSelect(t(s, dir, "embeddings"), queryId = 0L, k = 8)
      .toDF().select(col("rank"), col("vecId").as("vec_id"),
        col("relevance"), col("penalty"), col("score"))
      .orderBy(col("rank"))
  }

  // x7: per-document text statistics + quality score.
  def x7TextStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.wordCount(col("text")).as("word_count"),
        TextFunctions.tokenCount(col("text")).as("token_count"),
        round(TextFunctions.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextFunctions.stopwordRatio(col("text")), 6).as("stopword_ratio"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  // x8: language identification vs the labeled lang column.
  def x8LangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang").as("labeled"), TextFunctions.langId(col("text")).as("detected"))
      .groupBy(col("labeled"), col("detected"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("labeled"), col("detected"))

  // x9: document fingerprints via the native rolling-hash expression. The
  // oracle replays the 64-bit wrapping fold in DuckDB as HUGEINT modular
  // arithmetic (h*1000003+c mod 2^64, then two's-complement back to BIGINT)
  // — exact, so even the native codegen expression is hash-gated.
  def x9Fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
        col("doc_id"),
        rolling_hash(TextFunctions.normalizeText(col("text"))).as("fingerprint"))
      .orderBy(col("doc_id"))

  // x10: multimodal decode — image rows are real PNGs decoded through
  // javax.imageio, audio rows real WAV containers decoded through
  // javax.sound.sampled (format/rate/frames from the actual RIFF parse),
  // video rows real AVI containers (uncompressed RGB24 DIB frames)
  // decoded through a RIFF chunk walk that reads geometry from the
  // parsed avih/strf headers; every payload is md5-derived and the video
  // frames tile the digest cyclically (each byte exactly 3x across the
  // 48 samples), so DuckDB recomputes the expected stats from the hash
  // and the oracle validates ALL THREE encode → container → decode round
  // trips exactly. n_bytes (container size, an encoder detail) is
  // intentionally not selected.
  def x10MediaFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.syntheticMedia(t(s, dir, "documents")))
      .select(col("media_id"), col("media_type"), col("width"), col("height"),
        col("channels"), col("sample_rate"), col("n_frames"),
        round(col("px_mean"), 6).as("px_mean"), col("px_max"))
      .orderBy(col("media_id"))

  // x22: near-duplicate clusters — connected components over the MinHash
  // LSH pair list (x3's parameters); cluster_id = min doc id = the
  // canonical document a curation pipeline keeps. The DuckDB oracle
  // computes the same components with a recursive transitive closure.
  def x22DupClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, bands = 4, rows = 2, threshold = 0.6)
      .select(col("doc_a"), col("doc_b"))
    Dedup.dupClusters(docs.select(col("doc_id")), pairs, "doc_id")
      .orderBy(col("doc_id"))
  }

  // x28: first-seen near-dup dedup — keep a document iff nothing with a
  // smaller id shares an LSH band key. The batch twin of the streaming
  // dedup sink (StreamingDedup.minhashDedupSink); batch-boundary
  // independence is what makes this oracle also verify the stream's
  // semantics (StreamingSpec proves stream == this on sliced batches).
  def x28FirstSeenDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.firstSeenDedup(t(s, dir, "documents"), "doc_id", "text",
        n = 3, bands = 4, rows = 2)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  // x46: incremental dedup against a PERSISTED band index — two
  // id-ordered batches through Dedup.incrementalDedup must reproduce
  // x28's single-pass firstSeenDedup exactly (the oracle IS x28's SQL);
  // the index store table carries the decision state between batches,
  // which is the shape a production ingest actually runs.
  def x46IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val r = docs.agg(min(col("doc_id")).cast("long"),
      max(col("doc_id")).cast("long")).head()
    val cut = (r.getLong(0) + r.getLong(1)) / 2
    val store = Scratch.store(s, "graft_ext_q")
    Scratch.sealing(store) {
      val s1 = Dedup.incrementalDedup(store, "idx.bands",
        docs.filter(col("doc_id") <= cut), "doc_id", "text",
        n = 3, bands = 4, rows = 2)
      val s2 = Dedup.incrementalDedup(store, "idx.bands",
        docs.filter(col("doc_id") > cut), "doc_id", "text",
        n = 3, bands = 4, rows = 2)
      s1.select(col("doc_id"), col("lang"))
        .unionByName(s2.select(col("doc_id"), col("lang")))
        .orderBy(col("doc_id"))
    }
  }

  // x49: duplicated-span detection (substring dedup, Lee et al. 2022
  // shape) — merged intervals of 15-token windows shared verbatim across
  // documents; the spans a training pipeline cuts before tokenization.
  def x49SpanDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpans(t(s, dir, "documents"), "doc_id", "text", w = 15)
      .select(col("doc").as("doc_id"), col("n_dup_spans"), col("dup_tokens"))
      .orderBy(col("doc_id"))

  // x23: PII/noise scrub — URLs, e-mails and long digit runs replaced by
  // placeholder tokens, with per-document hit counts (the cheap pre-filter
  // pass every crawl corpus goes through before tokenization).
  def x23TextClean(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.cleanText(col("text")).as("clean_text"),
        regexp_count(col("text"), lit(TextFunctions.UrlRe)).as("n_urls"),
        regexp_count(col("text"), lit(TextFunctions.EmailRe)).as("n_emails"),
        regexp_count(col("text"), lit(TextFunctions.LongNumRe)).as("n_longnums"))
      .orderBy(col("doc_id"))

  // x24: repetition statistics — distinct-word ratio and top-word mass, the
  // standard cheap repetition/boilerplate quality signals. One explode +
  // two partial-aggregated groupBys, linear in corpus token count.
  def x24Repetition(s: SparkSession, dir: String): DataFrame = {
    val words = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(split(TextFunctions.normalizeText(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
    words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_count"))
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_words").cast("double"), 6)
          .as("rep_ratio"),
        round(col("top_count").cast("double") / col("n_words").cast("double"), 6)
          .as("top_word_frac"))
      .orderBy(col("doc_id"))
  }

  // x26: the end-to-end curation pipeline — the composite shape a training
  // corpus actually runs: quality gate → exact dedup (canonical = min id
  // per digest) → near-dup clustering over MinHash LSH pairs (keep cluster
  // canonicals) → deterministic train/val/test split. One oracle checks
  // the entire lineage.
  def x26Curation(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val qualified = docs
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= 0.5)
    val exactCanon = qualified
      .withColumn("text_md5", md5(TextFunctions.normalizeText(col("text"))))
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("text_md5")).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("text"), col("quality"))
      .persist() // feeds pair generation, clustering, and the final keep-join
    val pairs = Dedup.minhashLsh(exactCanon, "doc_id", "text",
        n = 3, bands = 4, rows = 2, threshold = 0.6)
      .select(col("doc_a"), col("doc_b"))
    val canonicals = Dedup.dupClusters(exactCanon.select(col("doc_id")), pairs, "doc_id")
      .filter(col("doc_id") === col("cluster_id")).select(col("doc_id"))
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    exactCanon.join(canonicals, Seq("doc_id"))
      .select(col("doc_id"), col("quality"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  // x20: deterministic corpus splitting — md5-bucket assignment to
  // train/val/test (80/10/10) plus a stable shuffle position, the standard
  // reproducible-split pattern for training pipelines (content-hash, no
  // RNG, so the split survives re-partitioning, re-runs, and engines).
  def x20DatasetSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    docs.select(
        col("doc_id"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"),
        md5(concat(lit("shuffle|"), col("doc_id").cast("string"))).as("shuffle_key"))
      .withColumn("shuffle_pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("split")).orderBy(col("shuffle_key"))))
      .orderBy(col("split"), col("shuffle_pos"))
  }

  // x30: train/eval decontamination — treat every 13th document as a held
  // -out benchmark and audit the remaining corpus for 3-gram overlap with
  // it. The benchmark shingle set broadcasts; corpus cost is one explode.
  def x30Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 13 =!= 0)
    val bench = docs.filter(col("doc_id") % 13 === 0)
    Dedup.crossCorpusOverlap(corpus, bench, "doc_id", "text", n = 3)
      .withColumn("contaminated", col("n_overlap") >= 3)
      .orderBy(col("doc_id"))
  }

  // x31: deterministic stratified sampling — per-language keep fractions
  // via a salted md5 bucket, the reproducible downsampling/rebalancing
  // step of corpus mixing (no RNG: the sample survives re-partitioning,
  // re-runs, and engines; sampling a 100 TB corpus is one codegen'd
  // filter, no shuffle).
  def x31StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val pct = Map("en" -> 20, "de" -> 50, "fr" -> 80) // percent kept; others 100
    val bucket = conv(substring(md5(concat(lit("strat|"), col("lang"), lit("|"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 100
    val keepPct = pct.foldLeft(lit(100)) { case (e, (l, p)) =>
      when(col("lang") === l, p).otherwise(e)
    }
    t(s, dir, "documents")
      .withColumn("bucket", bucket)
      .filter(col("bucket") < keepPct)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  // x32: per-document distinguishing terms from an inverted index — term
  // frequency joined with corpus document frequency, top-3 terms per doc
  // ranked (tf desc, docfreq asc, term asc). Integer-only scoring keeps
  // the oracle exact where a float tf-idf would be at the mercy of libm.
  // One explode + two partial-agg groupBys + a per-doc top-k window.
  def x32TopTerms(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(split(TextFunctions.normalizeText(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = words.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .withColumn("rank", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("n_docs").asc, col("term").asc)))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("n_docs"))
      .orderBy(col("doc_id"), col("rank"))
  }

  // x33: the store as a streaming SOURCE, driven end-to-end — documents
  // load into a store table over two commits, the DSv2 `graft-table`
  // source streams it (initial snapshot + append increment) into a
  // parquet file sink (distributed, exactly-once; no driver collect), and
  // the result aggregates per language. The oracle sees only the input
  // table, so any row the source dropped, duplicated, or mangled across
  // the two micro-batches breaks the hash.
  def x33TableStream(s: SparkSession, dir: String): DataFrame = {
    val out = Scratch.dir("graft_x33_out")
    val ckpt = Scratch.dir("graft_x33_ckpt")
    val store = Scratch.store(s, "graft_x33_store")
    Scratch.sealing(store, Seq(out, ckpt)) {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
      store.createOrReplace("stream.docs", docs.filter(col("doc_id") % 2 === 0))
      store.append("stream.docs", docs.filter(col("doc_id") % 2 === 1))
      val q = s.readStream.format("graft-table")
        .option("root", store.rootDir).option("table", "stream.docs").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("sum_chars"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("lang"))
    }
  }

  // x38: count-min-sketch heavy hitters — frequency estimation in O(d·w)
  // memory no matter the vocabulary size (the sketch table here is 3×64
  // counters; at 100 TB it is still 3×64). Buckets are md5-derived, so
  // the DuckDB oracle rebuilds the identical sketch and the estimates
  // (min over depths, always ≥ the true count) match exactly. Candidates
  // come from a deterministic document sample; estimation is a broadcast
  // join against the tiny sketch.
  def x38CountMin(s: SparkSession, dir: String): DataFrame = {
    val depths = 3
    val width = 64
    def bucketOf(d: Int, term: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      conv(substring(md5(concat(lit(s"cms$d|"), term)), 1, 8), 16, 10)
        .cast("long") % width
    val words = t(s, dir, "documents")
      .select(explode(split(TextFunctions.normalizeText(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    // ONE pass builds all depths: explode each token into its d buckets
    val sketch = words
      .select(explode(array((0 until depths).map(d =>
        struct(lit(d).as("depth"), bucketOf(d, col("term")).as("bucket"))): _*)).as("db"))
      .groupBy(col("db.depth").as("depth"), col("db.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val candidates = t(s, dir, "documents")
      .filter(col("doc_id") % 17 === 0)
      .select(explode(split(TextFunctions.normalizeText(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val est = (0 until depths).foldLeft(candidates) { (df, d) =>
      df.join(broadcast(sketch.filter(col("depth") === d)
          .select(col("bucket").as(s"b$d"), col("c").as(s"c$d"))),
        bucketOf(d, col("term")) === col(s"b$d"))
        .drop(s"b$d")
    }
    val truth = words.groupBy(col("term")).agg(count(lit(1)).as("true_count"))
    est.select(col("term"),
        least((0 until depths).map(d => col(s"c$d")): _*).as("est_count"))
      .join(truth, "term")
      .orderBy(col("est_count").desc, col("term")).limit(15)
      .select(col("term"), col("est_count"), col("true_count"))
  }

  // x39: time-series resample + gap-fill — regularize each user's
  // purchase history to a daily grid: per-user day spine (sequence +
  // explode, so spine generation is distributed and per-user bounded),
  // left join the observed daily sums, carry the last observation
  // forward, flag filled rows. The standard feature-engineering step
  // before windowed training data; all arithmetic integer/date, oracle
  // exact.
  def x39GapFill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = graft.streaming.EventStreams.normalizeTs(t(s, dir, "events"))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("value").cast("decimal(18,6)").as("v"))
      .groupBy(col("user_id"), col("day"))
      // decimal-sum → round → double: partitioning-independent, engine-exact
      .agg(round(sum(col("v")), 6).cast("double").as("day_value"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left_outer")
      .select(col("user_id"), col("day"),
        last(col("day_value"), ignoreNulls = true).over(w).as("value"),
        col("day_value").isNull.as("gap_filled"))
      .orderBy(col("user_id"), col("day"))
  }

  // x40: sliding-window chunking — split each document into overlapping
  // token windows (64 tokens, stride 48), the standard long-document →
  // training-example step. Chunk boundaries are pure integer arithmetic
  // over the token array; one explode, no shuffle before the final sort.
  def x40Chunking(s: SparkSession, dir: String): DataFrame = {
    val n = 64
    val stride = 48
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        split(TextFunctions.normalizeText(col("text")), " ").as("toks"))
      .withColumn("len", size(filter(col("toks"), t => length(t) > 0)))
      .filter(col("len") > 0)
      .withColumn("toks", filter(col("toks"), t => length(t) > 0))
    toks
      .withColumn("n_chunks",
        (ceil(greatest(col("len") - n, lit(0)).cast("double") / stride) + 1).cast("long"))
      .select(col("doc_id"), col("toks"), col("len"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("start"),
        array_join(slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"), lit(n)), " ")
          .as("chunk_text"),
        least(col("len") - col("chunk_id") * stride, lit(n.toLong)).as("chunk_len"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  // x41: domain mixture upsampling — per-language epoch weights (en 2.5,
  // de 1.0, fr 0.5, rest 1.0): every document appears floor(w) times plus
  // one more with probability frac(w), decided by a salted md5 bucket —
  // deterministic "temperature" resampling of the corpus mix, exactly
  // replayable across engines and reruns. One explode, no RNG, no shuffle.
  def x41Mixture(s: SparkSession, dir: String): DataFrame = {
    val wholeCopies = when(col("lang") === "en", 2).otherwise(
      when(col("lang") === "fr", 0).otherwise(1))
    val fracPct = when(col("lang") === "en", 50).otherwise(
      when(col("lang") === "fr", 50).otherwise(0))
    val bucket = conv(substring(md5(concat(lit("mix|"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long") % 100
    t(s, dir, "documents")
      .withColumn("n_copies", (wholeCopies + when(bucket < fracPct, 1).otherwise(0)).cast("long"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"), col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_id"))
      .orderBy(col("doc_id"), col("copy_id"))
  }

  // x42: the INCREMENTAL medallion — the reference's bronze→silver SCD2
  // flow re-expressed as a continuously-updating pipeline built entirely
  // from this engine's own parts: bronze is a store table, the DSv2
  // `graft-table` source streams its commits (initial snapshot, then the
  // append increment), and the streaming SCD2 sink applies each
  // micro-batch as ONE atomic file-pruned merge. Two AvailableNow drains
  // over one checkpoint make the batch boundaries deterministic, so the
  // resulting HISTORY (not just the current slice) is oracle-exact.
  // Semantics (the sink's contract, = the reference's load pattern): each
  // micro-batch is a COMPLETE bronze load — changed keys close+insert,
  // new keys insert, and keys absent from the load close as deleted.
  def x42IncrementalMedallion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = Scratch.dir("graft_x42_ckpt")
    val store = Scratch.store(s, "graft_x42_store")
    Scratch.sealing(store, Seq(ckpt)) {
      val cust = t(s, dir, "customer")
      val b1 = cust.filter(col("c_custkey") % 10 < 8)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val b2 = cust.filter(col("c_custkey") % 10 < 9 && col("c_custkey") % 17 =!= 0)
        .select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal")).as("c_acctbal"))
      val ts = Seq("2024-01-01 00:00:00", "2024-02-01 00:00:00")

      def drain(): Unit = {
        val q = graft.streaming.StreamingUpsert.scd2Sink(
            store.readStream("bronze.customer"),
            store, "silver.dim_customer", Seq("c_custkey"),
            batchId => lit(ts(math.min(batchId, 1L).toInt)))
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      store.createOrReplace("bronze.customer", b1) // load 1: full snapshot
      drain()                                      // batch 0 → scd2Init @ ts(0)
      store.append("bronze.customer", b2)          // load 2: incremental slice
      drain()                                      // batch 1 → atomic SCD2 merge @ ts(1)
      store.read("silver.dim_customer")
        .orderBy(col("c_custkey"), col(graft.operators.Scd.ValidFrom))
    }
  }

  // x43: deterministic negative sampling — k pseudo-random partners per
  // anchor for contrastive/retrieval training, drawn by walking a salted
  // cyclic ordering of the corpus (positions (pos + 7j) mod N). No RNG:
  // the same pairs come back on every engine, rerun and partitioning.
  // The ranking window is global here for oracle exactness; at corpus
  // scale the position column comes from the block-allocated
  // SurrogateKeys.assignDistributed pass instead (same downstream shape).
  def x43NegativeSampling(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 4
    val ranked = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(concat(lit("neg|"), col("doc_id").cast("string"))).as("salt"))
      .withColumn("pos", row_number().over(Window.orderBy(col("salt"), col("doc_id"))) - 1)
    val n = ranked.agg(count(lit(1)).as("n_docs"))
    val pairs = ranked
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("lang"), col("pos"), col("n_docs"),
        explode(sequence(lit(1L), lit(k.toLong))).as("j"))
      .withColumn("cand", (col("pos") + col("j") * 7) % col("n_docs"))
    val neg = ranked.select(col("pos").as("neg_pos"), col("doc_id").as("neg_doc_id"),
      col("lang").as("neg_lang"))
    pairs.join(neg, col("cand") === col("neg_pos"))
      .select(col("doc_id"), col("j"), col("neg_doc_id"),
        (col("lang") =!= col("neg_lang")).as("cross_lang"))
      .orderBy(col("doc_id"), col("j"))
  }

  // x44: Gopher-style n-gram repetition gates (Rae et al. 2021 §A1.1's
  // "fraction of characters in the most common n-gram" family, word-count
  // edition): per-document top-bigram mass, top-trigram mass and
  // duplicate-bigram mass, plus the keep flag their thresholds imply
  // (top-2-gram ≤ 20%, top-3-gram ≤ 18%, duplicated-2-gram mass ≤ 20%).
  // Outputs are raw counts and the flag an INTEGER inequality (top*5 ≤ n),
  // never a divided fraction — bit-stable across engines. Cost: one
  // explode per n, two partial-aggregated groupBys each — linear in
  // corpus tokens, and the per-doc n-gram group never exceeds document
  // length, so no key is hot at any corpus size.
  def x44GopherRepetition(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    def gramStats(n: Int, sfx: String) = {
      val gram = (0 until n).map(j => s"ws[i + $j]")
        .mkString("concat_ws(' ', ", ", ", ")")
      docs.select(col("doc_id"),
          explode(expr(s"transform(sequence(0, size(ws) - $n), i -> $gram)")).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as(s"n_$sfx"), max(col("c")).as(s"top_$sfx"),
          sum(when(col("c") >= 2, col("c")).otherwise(lit(0L))).as(s"dup_$sfx"))
    }
    gramStats(2, "bg").join(gramStats(3, "tg"), "doc_id")
      .select(col("doc_id"), col("n_bg"), col("top_bg"), col("dup_bg"),
        col("n_tg"), col("top_tg"), col("dup_tg"),
        (col("top_bg") * 5 <= col("n_bg") &&
          col("top_tg") * 50 <= col("n_tg") * 9 &&
          col("dup_bg") * 5 <= col("n_bg")).cast("int").as("keep"))
      .orderBy(col("doc_id"))
  }

  // x50: CCNet-style quality split WITHOUT a language model (Wenzek et
  // al. 2020 bucket head/middle/tail per language by LM perplexity; the
  // LM-free proxy ranks by mean corpus document-frequency of a doc's
  // tokens — fluent/common-token docs read as head, rare-token docs as
  // tail). BIGINT micro-unit scores via floor division keep the ranking
  // bit-exact cross-engine; ntile runs per LANGUAGE partition over a
  // total order (score desc, doc_id), so the sort shards by language —
  // the same per-shard bucketing the paper runs (production shards finer:
  // partition by (lang, md5-bucket) and bucket within shards).
  def x50QualityBuckets(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val dfreq = tok.groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val scored = tok.join(dfreq, "w")
      .groupBy(col("doc_id"), col("lang"))
      .agg(expr("cast((1000000 * sum(df)) div count(1) as bigint)").as("score_micro"))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("score_micro").desc, col("doc_id"))
    scored.select(col("doc_id"), col("lang"), col("score_micro"),
        ntile(3).over(wnd).cast("long").as("bucket"))
      .orderBy(col("doc_id"))
  }

  // x80: robust per-source outlier detection (median/MAD) — the quality
  // monitor a continuously-ingesting pipeline runs per source: a doc is
  // anomalous when its length deviates from the source median by more than
  // 3 MADs. Median/MAD (not mean/stddev) so a burst of junk can't drag its
  // own threshold. Two grouped percentile aggs + two joins, all keyed on
  // `source` (a low-cardinality dimension, so the stats frames broadcast);
  // the corpus is scanned twice and never shuffled on doc rows.
  def x80QualityOutliers(s: SparkSession, dir: String): DataFrame =
    robustOutliers(t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars")))
      .orderBy(col("doc_id"))

  /** Median/MAD outlier core of x80 over (doc_id, source, n_chars) —
    * public so the spec can drive degenerate fixtures (e.g. MAD = 0, where
    * EVERY deviation flags). */
  def robustOutliers(d: DataFrame): DataFrame = {
    val meds = d.groupBy(col("source"))
      .agg(expr("percentile(n_chars, 0.5)").as("med"))
    val dev = d.join(broadcast(meds), "source")
      .withColumn("dev", abs(col("n_chars") - col("med")))
    val mads = dev.groupBy(col("source"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mads), "source")
      .filter(col("dev") > lit(3.0) * col("mad"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"))
  }

  // x81: boilerplate mass / shingle novelty (the RefinedWeb-style shared-
  // content signal): per doc, the fraction of its DISTINCT 5-gram shingles
  // that occur in at least one other document — header/footer/template
  // mass that repetition stats (x24, within-doc) and span dedup (x49,
  // exact positions) don't isolate. Integer micro-units, floor division.
  // Scale shape: one shingle explode + a (doc, shingle) distinct + a
  // shingle-keyed df agg + one join back — every shuffle is keyed on the
  // shingle, all corpus-linear. The shingle is hashed to 60 bits right at
  // the explode (md5-prefix, the repo's engine-portable hash convention —
  // DuckDB replays it exactly via ('0x'||substr(md5(s),1,15))::BIGINT), so
  // every shuffle and the df table carry an 8-byte key instead of a ~30+
  // byte string — ~10x fewer shuffle bytes at 100 TB. Docs with < 5 tokens
  // carry no shingles and drop out.
  def x81ShingleNovelty(s: SparkSession, dir: String): DataFrame =
    shingleNovelty(t(s, dir, "documents")).orderBy(col("doc_id"))

  /** Shared-shingle core of x81 — public so the spec can drive fixtures
    * (within-doc repeats, short docs, exact micro arithmetic). */
  def shingleNovelty(docs: DataFrame): DataFrame = {
    // fanOut before the tokenize + shingle explode + md5 hashing (§2.5)
    val toks = graft.sources.Tables.fanOut(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => length(w) > 0).as("ws"))
      .filter(size(col("ws")) >= 5)
    val sh = toks.select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 4), i -> array_join(slice(ws, i, 5), ' '))"))
        .as("s"))
      .select(col("doc_id"), Dedup.shingleHash(col("s")).as("shh"))
      .distinct()
    val df = sh.groupBy(col("shh")).agg(count(lit(1)).as("df"))
    sh.join(df, "shh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("shared_shingles"))
      .select(col("doc_id"), col("n_shingles"), col("shared_shingles"),
        expr("(1000000 * shared_shingles) div n_shingles").as("boilerplate_micro"))
  }

  // x83: novelty-at-arrival boilerplate monitor — x81's semantics run
  // incrementally over three id-ordered ingest batches against a persisted
  // shingle index (see Dedup.incrementalNovelty). A doc's shingle counts
  // as shared when an earlier batch indexed it or a same-batch sibling
  // carries it; later arrivals never rewrite history.
  def x83IncrementalNovelty(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val r = docs.agg(min(col("doc_id")).cast("long"),
      max(col("doc_id")).cast("long")).head()
    val cut = (r.getLong(0) + r.getLong(1)) / 2
    val store = Scratch.store(s, "graft_x83_store")
    Scratch.sealing(store) {
      val b1 = graft.operators.Dedup.incrementalNovelty(store, "idx.shingles",
        docs.filter(col("doc_id") <= cut / 2))
      val b2 = graft.operators.Dedup.incrementalNovelty(store, "idx.shingles",
        docs.filter(col("doc_id") > cut / 2 && col("doc_id") <= cut))
      val b3 = graft.operators.Dedup.incrementalNovelty(store, "idx.shingles",
        docs.filter(col("doc_id") > cut))
      b1.unionByName(b2).unionByName(b3).orderBy(col("doc_id"))
    }
  }

  /** Trusted reference slice for the model-based curation ops (x51/x52) —
    * stands in for CCNet's Wikipedia / DSIR's target domain. Shared with
    * the oracle texts. */
  private val RefSlice = Seq("src0", "src1")
  private val RefSliceSql = RefSlice.map(s => s"'$s'").mkString(", ")

  // x51: CCNet-style bigram-LM fluency scoring (Wenzek et al. 2020) — a
  // Laplace-smoothed bigram model trained on the trusted slice scores every
  // document by mean smoothed bigram probability. Integer micro-units
  // (floor division, no logs/floats) make the score bit-exact cross-engine.
  // See operators/LangModel.scala for the 100 TB shape.
  def x51BigramFluency(s: SparkSession, dir: String): DataFrame =
    graft.operators.LangModel.bigramFluency(
        t(s, dir, "documents"), col("source").isin(RefSlice: _*))
      .orderBy(col("doc_id"))

  // x52: DSIR importance-resampling selection (Xie et al. 2023) — hashed
  // unigram buckets, target/raw smoothed probability ratio in exact
  // DECIMAL(38,0) micro-units, per-doc mean weight, corpus-mean gate.
  // See operators/LangModel.scala.
  def x52DsirSelect(s: SparkSession, dir: String): DataFrame =
    graft.operators.LangModel.dsirSelect(
        t(s, dir, "documents"), col("source").isin(RefSlice: _*), buckets = 256)
      .orderBy(col("doc_id"))

  // x53: vocabulary-encoded token ids — top-512 corpus vocabulary (count
  // desc, token asc), UNK id 0, per-doc ordered id sequence as a
  // space-joined string. The tokenize-to-ids step between curation and
  // x35's sequence packing. See operators/Packing.scala.
  def x53TokenIds(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.encodeTokenIds(t(s, dir, "documents"), vocabSize = 512)
      .orderBy(col("doc_id"))

  // x54: corpus profile ("dataset card" stats) per source — docs, tokens,
  // languages, chars, and exact-duplicate mass (docs whose normalized-text
  // md5 repeats anywhere in the corpus). One token-size projection + one
  // hash-key self-aggregation + one groupBy: three shuffles, all linear,
  // all integer-exact. The audit table a curation run publishes next to
  // the data it ships.
  def x54CorpusProfile(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(
      col("source"), col("lang"), col("n_chars"),
      size(filter(split(col("text"), " "), w => length(w) > 0)).as("n_tok"),
      md5(TextFunctions.normalizeText(col("text"))).as("h"))
    val dup = d.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("h"), lit(1L).as("dup"))
    d.join(dup, Seq("h"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(coalesce(col("dup"), lit(0L))).as("dup_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))
  }

  // x55: incrementally-maintained corpus profile — the monitoring table a
  // continuously-ingesting pipeline keeps current without ever rescanning
  // the corpus: per-source doc/token/char totals as an incremental
  // materialized view (signed per-group deltas through one file-pruned
  // merge per refresh — q52's machinery on the curation surface). Ingest
  // arrives in three id-range batches, then a curation pass deletes
  // flagged docs and the profile follows. The non-incremental stats
  // (distinct langs, dup mass) stay in the batch profile x54.
  def x55IncrementalProfile(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id"), col("source"), col("n_chars"),
      size(filter(split(col("text"), " "), w => length(w) > 0))
        .cast("long").as("n_tok"))
    val Seq(b1, b2, b3) = thirdsByDocId(docs)
    val store = Scratch.store(s, "graft_ext_prof")
    Scratch.sealing(store) {
      store.createOrReplace("cur.docs", b1)
      store.createMaterializedView("cur.profile", "cur.docs", Seq("source"),
        Seq(("n_docs", "count", "*"), ("n_tokens", "sum", "n_tok"),
          ("sum_chars", "sum", "n_chars")))
      store.append("cur.docs", b2)
      store.refreshMaterializedView("cur.profile")
      store.append("cur.docs", b3)
      store.refreshMaterializedView("cur.profile")
      store.delete("cur.docs", col("doc_id") % 97 === 0) // curation pass
      store.refreshMaterializedView("cur.profile")
      store.read("cur.profile")
        .select(col("source"), col("n_docs"), col("n_tokens"), col("sum_chars"))
        .orderBy(col("source"))
    }
  }

  // x56: deterministic global shuffle + shard layout — the curated corpus
  // laid out as 8 equally-loaded shards in a pseudo-random but exactly
  // replayable training order, with each document's in-shard position and
  // running token offset. No global sort anywhere: shard = hash of id,
  // order = md5(seed|id) per shard; see operators/Sharding.scala for the
  // 100 TB shape (one hash shuffle, window partitions bounded by shard
  // count sized to the cluster).
  def x56ShardLayout(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sharding.shardLayout(
        t(s, dir, "documents"), col("doc_id"),
        size(filter(split(TextFunctions.normalizeText(col("text")), " "),
          w => length(w) > 0)),
        nShards = 8)
      .orderBy(col("shard"), col("pos"))

  // x57: embedding-space decontamination — the semantic twin of x30's
  // n-gram overlap check: drop training documents whose embedding is too
  // close (cosine ≥ 0.45) to any held-out benchmark vector. The benchmark
  // side (vec_id % 25 = 0 here; a few thousand rows in production) is
  // broadcast, so the corpus side streams partition-local with no shuffle
  // before the per-doc max — corpus-linear at any scale.
  def x57EmbedDecontam(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val bench = emb.filter(col("vec_id") % 25 === 0)
      .select(col("embedding").as("b_emb"))
    emb.filter(col("vec_id") % 25 =!= 0)
      .join(broadcast(bench))
      .groupBy(col("vec_id"))
      .agg(max(Similarity.cosine(col("embedding"), col("b_emb"))).as("max_cos"))
      .select(col("vec_id"), col("max_cos"),
        (col("max_cos") >= 0.4499995).as("contaminated"))
      .orderBy(col("vec_id"))
  }

  // x59: training-export manifest — the handoff artifact between the data
  // engine and the training job: the x56 shard layout materialized as a
  // store table PARTITIONED BY shard (each shard = one directory a data
  // loader mounts, rows in training order), then the per-shard manifest
  // the trainer checksums its input against: doc count, token total, and
  // an order-sensitive md5 over the doc-id sequence. Reading one shard
  // prunes to that shard's files alone (ExtensionSpec pins the file
  // count), so a 1000-worker trainer never scans a byte of another
  // worker's shard.
  def x59ExportManifest(s: SparkSession, dir: String): DataFrame = {
    val layout = graft.operators.Sharding.shardLayout(
      t(s, dir, "documents"), col("doc_id"),
      size(filter(split(TextFunctions.normalizeText(col("text")), " "),
        w => length(w) > 0)),
      nShards = 8)
    val store = Scratch.store(s, "graft_ext_export")
    Scratch.sealing(store) {
      store.createOrReplace("export.shards", layout,
        partitionBy = Seq("shard"), sortWithin = Seq("pos"))
      store.read("export.shards")
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          md5(array_join(
            transform(array_sort(collect_list(struct(col("pos"), col("doc_id")))),
              r => r.getField("doc_id").cast("string")), ",")).as("ids_md5"))
        .orderBy(col("shard"))
    }
  }

  // x58: C4-style segment dedup with rewrite — cut every document into
  // 4-token segments, keep only the globally first occurrence of each
  // repeated segment, and reassemble the surviving text. The removal
  // counterpart of x49's span *detection*; see Dedup.segmentDedup for the
  // two-hash-shuffle scale shape.
  def x58SegmentDedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.segmentDedup(t(s, dir, "documents"), segTokens = 4)
      .orderBy(col("doc_id"))

  // x61: data-quality expectations (the DLT EXPECT / EXPECT OR DROP /
  // EXPECT OR FAIL idiom): a declared gate over the corpus produces the
  // per-expectation pass/fail report in ONE aggregation pass — every
  // predicate evaluated per row map-side, partial sums combined, no
  // per-expectation jobs and no row-data shuffle. enforce()'s
  // kept/quarantine split (with per-row violation reasons) is pinned in
  // ExtensionSpec; this query is the report a run publishes to its
  // quality dashboard.
  def x61Expectations(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations.{Expectation => E}
    graft.operators.Expectations.report(t(s, dir, "documents"), Seq(
        E("has_id", col("doc_id").isNotNull, "fail"),
        E("known_lang", col("lang").isin("en", "de", "fr"), "drop"),
        E("nonempty_text", length(col("text")) > 0, "drop"),
        E("short_doc", col("n_chars") <= 400, "warn")))
      .orderBy(col("expectation"))
  }

  // x62: streaming quality gate — x61's expectations applied per
  // micro-batch on a live ingest: bronze commits stream through the DSv2
  // table source, each batch's kept rows and quarantine commit as ONE
  // atomic store transaction (stream_append batch markers make replays
  // no-ops), and the quarantine keeps WHY each row was rejected and in
  // which batch. Two AvailableNow drains over one checkpoint make the
  // batch boundaries deterministic, so the full quarantine table —
  // violations, batch ids and all — is oracle-exact.
  def x62StreamingQuality(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Expectations.{Expectation => E}
    val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars"))
    val r = docs.agg(min(col("doc_id")).cast("long"),
      max(col("doc_id")).cast("long")).head()
    val cut = (r.getLong(0) + r.getLong(1)) / 2
    val gates = Seq(
      E("known_lang", col("lang").isin("en", "de", "fr"), "drop"),
      E("short_doc", col("n_chars") <= 400, "drop"))
    val ckpt = Scratch.dir("graft_x62_ckpt")
    val store = Scratch.store(s, "graft_x62_store")
    Scratch.sealing(store, Seq(ckpt)) {
      def drain(): Unit = {
        val q = graft.streaming.StreamingIngest.gatedAppendSink(
            store.readStream("bronze.docs"), store, "silver.docs",
            "quality.quarantine", gates)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      store.createOrReplace("bronze.docs", docs.filter(col("doc_id") <= cut))
      drain() // batch 0
      store.append("bronze.docs", docs.filter(col("doc_id") > cut))
      drain() // batch 1
      store.read("quality.quarantine")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          array_join(array_sort(col("_violations")), ",").as("violations"),
          col("_batch_id"))
        .orderBy(col("doc_id"))
    }
  }

  // x63: quarantine reprocessing (dead-letter replay) — the lifecycle
  // step after x62: the short-doc gate relaxes from 400 to 500 chars, the
  // CURRENT gates re-run over the quarantine, newly-passing rows move to
  // silver and the rest stay with freshly computed violations — one
  // atomic transaction for the move. Output = the quarantine AFTER the
  // replay; the spec pins the admitted silver side.
  def x63QuarantineReplay(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations.{Expectation => E}
    val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars"))
    def gates(maxChars: Int) = Seq(
      E("known_lang", col("lang").isin("en", "de", "fr"), "drop"),
      E("short_doc", col("n_chars") <= maxChars, "drop"))
    val store = Scratch.store(s, "graft_x63_store")
    Scratch.sealing(store) {
      // initial gated load (strict gates), then the relaxed replay
      graft.streaming.StreamingIngest.gatedAppendBatch(
        store, "silver.docs", "quality.quarantine", gates(400))(docs, 0L)
      graft.operators.Expectations.reprocessQuarantine(
        store, "silver.docs", "quality.quarantine", gates(500))
      store.read("quality.quarantine")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          array_join(array_sort(col("_violations")), ",").as("violations"))
        .orderBy(col("doc_id"))
    }
  }

  // x64: incremental segment dedup — x58 as a continuously-ingesting
  // pipeline runs it: two id-ordered batches dedup against a persisted
  // segment-hash index (batch cost ∝ batch; the index grows by novelty
  // only). The oracle is x58's single-pass SQL VERBATIM: for id-ordered
  // batches the incremental union must equal the one-shot result.
  def x64IncrementalSegments(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val r = docs.agg(min(col("doc_id")).cast("long"),
      max(col("doc_id")).cast("long")).head()
    val cut = (r.getLong(0) + r.getLong(1)) / 2
    val store = Scratch.store(s, "graft_x64_store")
    Scratch.sealing(store) {
      val b1 = graft.operators.Dedup.incrementalSegmentDedup(store, "idx.segs",
        docs.filter(col("doc_id") <= cut), segTokens = 4)
      val b2 = graft.operators.Dedup.incrementalSegmentDedup(store, "idx.segs",
        docs.filter(col("doc_id") > cut), segTokens = 4)
      b1.unionByName(b2).orderBy(col("doc_id"))
    }
  }

  /** The literal query set for x34 — shared with the oracle text. */
  private val Bm25Queries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("spark", "join"),
    1 -> Seq("table", "scan", "fast"),
    2 -> Seq("vector", "stream"))

  // x34: BM25 keyword retrieval (top-10 per query) — ranked search for
  // targeted curation and decontamination audits. Log-free rational idf +
  // BIGINT micro-unit scores make the ranking bit-exact cross-engine; see
  // operators/Retrieval.scala.
  def x34Bm25TopK(s: SparkSession, dir: String): DataFrame =
    graft.operators.Retrieval.bm25TopK(t(s, dir, "documents"), Bm25Queries, k = 10)
      .orderBy(col("query_id"), col("rk"))

  // x35: concat-and-chunk sequence packing (budget 512 tokens, bucket =
  // 100 ids) — the corpus-to-training-sequence layout step. Pure integer
  // window arithmetic; packs never span buckets so every bucket packs in
  // parallel. See operators/Packing.scala.
  def x35SeqPacking(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.packSequences(t(s, dir, "documents"),
        TextFunctions.tokenCount(col("text")), budget = 512L, bucketRows = 100L)
      .orderBy(col("doc_id"))

  // x47: hybrid retrieval — lexical (n-gram Jaccard more-like-this) and
  // semantic (embedding cosine) top-20 rankings fused by reciprocal-rank
  // fusion with BIGINT micro-unit scores (exact cross-engine). The
  // testdata's vec_id i is doc i's embedding, so both rankers speak the
  // same id space. The production shape for "find more documents like
  // these" curation sweeps.
  def x47HybridRetrieval(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val emb = t(s, dir, "embeddings")
    val sem = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 20)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rk"))
    val lex = graft.operators.Retrieval.jaccardTopK(docs, col("doc_id") < 5, k = 20)
      .select(col("query_id"), col("doc_id"), col("rk"))
    graft.operators.Retrieval.rrfFuse(Seq(lex, sem), k = 10)
      .orderBy(col("query_id"), col("rk"))
  }

  // x65: hard-negative mining — for each anchor embedding (every 25th
  // vector), the 5 most cosine-similar vectors with a DIFFERENT label.
  // The ANN-shaped hard counterpart to x43's cyclic easy negatives:
  // high-similarity cross-label pairs are the examples a contrastive
  // objective learns most from. Anchors broadcast; corpus-linear scoring.
  def x65HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") % 25 === 0), k = 5)
      .select(col("anchor_id"), col("neg_id"), col("neg_label"), col("cos_sim"), col("rk"))
      .orderBy(col("anchor_id"), col("rk"))
  }

  // x66: leakage-safe dataset split — near-dup clusters (x22's connected
  // components) are assigned to train/val/test ATOMICALLY, so no
  // near-duplicate pair ever straddles a split boundary (the train→test
  // leak a doc-level split like x20 permits). The split decision hashes
  // the cluster id, not the doc id; singletons degrade to x20's behavior.
  def x66LeakageSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, bands = 4, rows = 2, threshold = 0.6)
      .select(col("doc_a"), col("doc_b"))
    val clusters = Dedup.dupClusters(docs.select(col("doc_id")), pairs, "doc_id")
    val bucket = conv(substring(md5(concat(lit("cl|"), col("cluster_id").cast("string"))), 1, 8), 16, 10)
      .cast("long") % 100
    clusters.select(col("doc_id"), col("cluster_id"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  // x67: per-source token-budget sampling — deterministic md5 shuffle
  // order within each source, running token total via one window, keep
  // docs while the total fits the budget. The assembly step that turns
  // mixture weights (x41) into an actual capped corpus; at 100 TB this is
  // one window per source partition — no global shuffle, no collect.
  def x67TokenBudget(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("prio"), col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        TextFunctions.wordCount(col("text")).cast("long").as("n_tokens"),
        md5(concat(lit("prio|"), col("doc_id").cast("string"))).as("prio"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= 800)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("source"), col("cum_tokens"))
  }

  // x69: bigram collocation mining — top-20 word pairs by integer
  // micro-unit lift (monotone twin of PMI) with a min-count cut. The
  // boilerplate-phrase / domain-vocabulary probe; see Collocations for
  // the BIGINT exactness and no-shuffle-pair-formation design.
  def x69PmiBigrams(s: SparkSession, dir: String): DataFrame =
    graft.operators.Collocations.bigramLift(
      t(s, dir, "documents"), "doc_id", "text", minCount = 5, k = 20)

  // x70: inverted-index posting lists — term → (df, total_tf,
  // "docId:tf,…" sorted posting string). The retrieval/decontamination
  // index as a first-class table; the maxDf stop-word guard is wide open
  // here (its cut semantics are spec-pinned in AdvancedOpsSpec) so the
  // query exercises full posting construction at every scale factor.
  def x70InvertedIndex(s: SparkSession, dir: String): DataFrame =
    graft.operators.Collocations.invertedIndex(
      t(s, dir, "documents"), "doc_id", "text", minDf = 5, maxDf = 1000000L)

  // x71: weighted sample — 50 docs drawn without replacement with
  // probability ∝ n_chars, via the exact-BIGINT hash-priority race
  // (Sampling.weightedPriority). No RNG: replayable across engines.
  def x71WeightedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedPriority(
      t(s, dir, "documents"), "doc_id", "n_chars", k = 50)

  // x74: T5-style span-corruption examples — 15% deterministic token
  // masking, consecutive masked runs collapse to one <extra_id_k>
  // sentinel, (input, target) reassembled exactly (see Denoising).
  def x74SpanCorruption(s: SparkSession, dir: String): DataFrame =
    graft.operators.Denoising.spanCorruption(
      t(s, dir, "documents"), "doc_id", "text", maskPct = 15)

  // x84: blocked fuzzy self-join (entity resolution) on document titles
  // (first 60 chars) — prefix+suffix blocking, levenshtein <= 8 scored
  // only inside blocks. Finds the near-identical intro boilerplate pairs
  // without an all-pairs comparison.
  def x84FuzzyJoin(s: SparkSession, dir: String): DataFrame =
    x84FuzzyJoinWithStats(s, dir)._1

  /** x84 through the run-scoped stats API ([[graft.operators.Fuzzy
    * .fuzzySelfJoinWithStats]]): the (frame, reading) pair an alert
    * consumer uses when queries run concurrently (the `lastBlockStats`
    * hook is last-writer-wins). The oracle map gates `_1`; ExtensionSpec
    * gates `_2` against a direct block-size recompute. */
  def x84FuzzyJoinWithStats(s: SparkSession, dir: String,
      maxBlock: Int = 4096): (DataFrame, graft.operators.Fuzzy.BlockStats) = {
    val (out, st) = graft.operators.Fuzzy.fuzzySelfJoinWithStats(
      t(s, dir, "documents").select(col("doc_id"),
        substring(col("text"), 1, 60).as("title")),
      "doc_id", "title", maxDist = 8, blockLen = 8, maxBlock = maxBlock)
    (out.orderBy(col("id_a"), col("id_b")),
      st.getOrElse(sys.error("stats-collecting run returned no reading")))
  }

  // x85: exact triangle census of the part co-purchase graph (subsampled
  // to every 7th order so the wedge stage stays bench-bounded at sf0.1)
  // via degree-ordered orientation — one row: nodes/edges/wedges/
  // triangles/global-clustering-coefficient in micro-units.
  def x85Triangles(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val e = li.alias("a").join(li.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    graft.operators.Graph.triangles(e)
  }

  // x86: length-bucketed padded-batch economics over a fixed power-of-two
  // ladder (32..512 tokens, batches of 8) — per-rung doc counts, batch
  // counts, padded slots and padding waste in per-mille.
  def x86LengthBuckets(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.lengthBuckets(t(s, dir, "documents"),
        ladder = Seq(32L, 64L, 128L, 256L, 512L), batchSize = 8L)
      .orderBy(col("rung"))

  // x87: first-order Markov transition matrix over per-user event
  // sequences — counts and integer micro-unit conditional probabilities
  // for every (prev_type, next_type) adjacency.
  def x87Transitions(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.transitionMatrix(t(s, dir, "events"))
      .orderBy(col("prev_type"), col("next_type"))

  // x88: top-10 most frequent 3-step event paths — multi-hop journey
  // mining over the same (ts, event_id) total order as x87.
  def x88TopPaths(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.topPaths(t(s, dir, "events"), depth = 3, k = 10)
      .orderBy(col("rk"))

  // x89: k-core peeling trace (k=20, 4 rounds) over the x85 co-purchase
  // graph — per-round surviving node/edge counts; equal consecutive rows
  // mean the core converged.
  def x89KCore(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val e = li.alias("a").join(li.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    graft.operators.Graph.kCore(e, k = 20, rounds = 4)
      .orderBy(col("round"))
  }

  // x92: TextRank keywords — PageRank over the within-2-window word
  // co-occurrence graph, top-20 by exact micro-unit rank.
  def x92TextRank(s: SparkSession, dir: String): DataFrame =
    graft.operators.Collocations.textRank(t(s, dir, "documents"),
        window = 2, iterations = 3, k = 20)
      .orderBy(col("rk"))

  // x93: label propagation — extend the lang labels of the doc_id%5==0
  // seed slice across the MinHash-LSH near-dup graph, 2 rounds; ties
  // break by label order, so the walk is oracle-exact.
  def x93LabelProp(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val edges = Dedup.minhashLsh(docs, "doc_id", "text",
        n = 3, bands = 4, rows = 2, threshold = 0.6)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val seeds = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("lang"))
    graft.operators.Graph.labelPropagation(edges, seeds, rounds = 2,
        idCol = "doc_id", labelCol = "lang")
      .select(col("id").as("doc_id"), col("label"), col("round"))
      .orderBy(col("doc_id"))
  }

  // x94: corpus drift report — unigram distribution delta between two
  // ingest slices (even vs odd doc ids standing in for "last week vs this
  // week"): per-term probability in integer micro-units on each side, the
  // top-20 movers by absolute delta. The monitoring query a continuously-
  // ingesting pipeline runs to catch a source going off-distribution
  // before it poisons a training mix. Scale shape: one tokenize +
  // map-side-combined count per slice (vocabulary-sized results), a
  // vocabulary-sized full-outer join, scalar totals broadcast via 1-row
  // crossJoins, TakeOrdered cut — the corpus itself is never joined or
  // re-shuffled.
  def x94Drift(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    def slice(side: org.apache.spark.sql.Column) = docs.filter(side)
      .select(explode(filter(
        split(graft.functions.TextFunctions.normalizeText(col("text")), " "),
        w => length(w) > 0)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val a = slice(col("doc_id") % 2 === 0)
    val b = slice(col("doc_id") % 2 =!= 0)
    val ta = a.agg(sum(col("c")).cast("long").as("tot_a"))
    val tb = b.agg(sum(col("c")).cast("long").as("tot_b"))
    a.select(col("term"), col("c").as("c_a"))
      .join(b.select(col("term"), col("c").as("c_b")), Seq("term"), "full_outer")
      .crossJoin(ta).crossJoin(tb)
      .select(col("term"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"),
        expr("(coalesce(c_a, 0L) * 1000000L) div tot_a").as("p_a_micro"),
        expr("(coalesce(c_b, 0L) * 1000000L) div tot_b").as("p_b_micro"))
      .withColumn("delta_micro", abs(col("p_a_micro") - col("p_b_micro")))
      .orderBy(col("delta_micro").desc, col("term"))
      .limit(20)
  }

  /** x95's target mixture (micro-units, sums to 1e6) — deliberately
    * over-asks de (exhausts round 1) and fr (exhausts only in round 2,
    * AFTER de's surplus redistributes — the cascade single-pass
    * proportional splitting gets wrong). */
  val MixTargets: Seq[(String, Long)] = Seq(
    "en" -> 300000L, "de" -> 250000L, "fr" -> 225000L,
    "es" -> 150000L, "zh" -> 75000L)

  // x95: water-filling mixture allocation — per-language token
  // allocations for a 60% corpus budget under MixTargets; 3 fixed
  // redistribution rounds on the language-cardinality frame.
  def x95WaterFill(s: SparkSession, dir: String): DataFrame = {
    val avail = t(s, dir, "documents")
      .groupBy(col("lang").as("grp"))
      .agg(sum(size(filter(split(col("text"), " "),
        w => length(w) > 0)).cast("long")).as("avail"))
    graft.operators.Sampling.waterFill(avail, MixTargets.toMap,
        budgetNum = 3L, budgetDen = 5L, rounds = 3)
      .select(col("grp").as("lang"), col("avail"), col("share_micro"),
        col("budget"), col("alloc"), col("exhausted"))
      .orderBy(col("lang"))
  }

  // x96: cluster-size-balanced sampling weights — every doc weighted
  // 1e6/|its near-dup cluster|, so a 50-copy boilerplate family carries
  // the same total sampling mass as a singleton. The soft alternative to
  // hard dedup (x22 keeps one per cluster; this keeps all, downweighted).
  //
  // The weights join is autoSaltedJoin's production consumer: docs join
  // their cluster's size on cluster_id, a frame that at 100 TB is
  // cluster-cardinality (~half the corpus in the worst case — NOT
  // broadcastable), and near-dup cluster sizes are the textbook skewed
  // distribution (one viral boilerplate family = one hot key holding
  // millions of rows). The diagnose→salt pass spreads only the hot
  // clusters' rows; at sample scale no cluster crosses the threshold and
  // the plan degenerates to the plain equi-join plus one map-side-
  // combined pre-flight count (the x104 oracle pins salt-invariance, the
  // x96 oracle pins this wiring).
  def x96ClusterWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
        n = 3, bands = 4, rows = 2, threshold = 0.6)
      .select(col("doc_a"), col("doc_b"))
    // materialize the labels once: THREE consumers read them (the size
    // agg, the salted join's big side, and its hot-key pre-flight) — lazy,
    // each would replay the whole LSH + label-propagation pipeline
    val clusters = Dedup.dupClusters(docs.select(col("doc_id")), pairs, "doc_id")
      .materialized
    val sizes = clusters.groupBy(col("cluster_id")).agg(count(lit(1)).as("csize"))
    graft.operators.Salting.autoSaltedJoin(clusters, sizes, Seq("cluster_id"),
        hotThreshold = 4096L, buckets = 16)
      .select(col("doc_id"), col("cluster_id"), col("csize"),
        expr("1000000L div csize").as("weight_micro"))
      .orderBy(col("doc_id"))
  }

  // x97: fuzzy dictionary lookup — link odd-doc titles to the even-doc
  // canonical dictionary, best match (lowest dist, then lowest ref id)
  // within 8 edits; same prefix+suffix blocking as x84.
  def x97FuzzyLookup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 60).as("title"))
    graft.operators.Fuzzy.fuzzyLookup(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "title", "doc_id", "title", maxDist = 8, blockLen = 8)
      .select(col("l_id").as("doc_id"), col("r_id").as("ref_id"), col("dist"))
      .orderBy(col("doc_id"))
  }

  // x99: mixed-language detection — run the x8 n-gram language heuristic
  // on each document's first and second token halves independently and
  // flag disagreement: the internal-consistency signal that catches
  // concatenation artifacts (scraped pages glueing a nav bar in another
  // language, template+content mixes) that a whole-doc langid averages
  // away. Docs under 4 tokens have no meaningful halves and drop.
  // Row-local throughout: one projection computes both half strings and
  // both language scores; no shuffle before the presentation sort.
  def x99MixedLang(s: SparkSession, dir: String): DataFrame = {
    val ws = filter(split(TextFunctions.normalizeText(col("text")), " "),
      w => length(w) > 0)
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), ws.as("ws"))
      .filter(size(col("ws")) >= 4)
      .select(col("doc_id"), col("lang"),
        concat_ws(" ", expr("slice(ws, 1, size(ws) div 2)")).as("head_txt"),
        concat_ws(" ", expr("slice(ws, size(ws) div 2 + 1, size(ws) - size(ws) div 2)"))
          .as("tail_txt"))
      .select(col("doc_id"), col("lang"),
        TextFunctions.langId(col("head_txt")).as("head_lang"),
        TextFunctions.langId(col("tail_txt")).as("tail_lang"))
      .withColumn("mixed", col("head_lang") =!= col("tail_lang"))
      .orderBy(col("doc_id"))
  }

  // x100: dedup-decision audit — for every document x28's first-seen
  // dedup would drop, WHO shadowed it (the earliest band-key partner) and
  // the VERIFIED Jaccard of that pair in micro-units. The provenance
  // trail a curation pipeline keeps so a dedup decision can be appealed:
  // a low jaccard_micro on a dropped row is a banding false positive made
  // visible. Scale shape: the shadow map is the same bucket self-join x28
  // already pays; exact verification then runs ONLY on the shadow pairs —
  // the shingle relation is semi-join-restricted to the involved docs
  // before the quadratic intersection, so audit cost tracks the dropped
  // set, not the corpus.
  //
  // CONTRACT (r16 lazy rebuild, same for x112): the returned frame is a
  // LAZY plan over pinned intermediates, sized for a single consuming
  // action (the bench/oracle shape). A caller taking many actions on it
  // re-executes the final audit joins per action (the pinned band/shingle
  // caches absorb the expensive half while their generation lives); a
  // caller needing a stable snapshot materializes it (write, or
  // localCheckpoint) itself.
  def x100DedupAudit(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // band keys + the restricted shingle relation are pinned through the
    // input-keyed PinnedGenerations LRU (not persist/unpersist-per-call):
    // the returned audit stays LAZY over them, a repeated audit on the
    // same corpus reuses the live blocks, and the LRU bounds what a long
    // session keeps pinned — the same lifecycle the one-shot dedup
    // operators use (this site previously localCheckpointed the result
    // just so it could unpersist eagerly, paying a full audit
    // materialization per call).
    val bk = graft.core.PinnedGenerations.persistPinned(
      Dedup.bandKeys(docs, "doc_id", "text", n = 3, bands = 4, rows = 2))
    // the shadow map (dropped-set-sized, tiny) feeds the ids restriction
    // AND the final audit join — pinned so neither pass re-runs the
    // band-bucket self-join
    val shadow = graft.core.PinnedGenerations.persistPinned(
      bk.alias("a").join(bk.alias("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("b.doc") < col("a.doc"))
        .groupBy(col("a.doc").as("dropped_doc"))
        .agg(min(col("b.doc")).as("shadowed_by")))
    val ids = shadow.select(col("dropped_doc").as("doc"))
      .unionAll(shadow.select(col("shadowed_by").as("doc"))).distinct()
    val sh = graft.core.PinnedGenerations.persistPinned(
      Dedup.shingles(docs, "doc_id", "text", 3)
        .join(ids, Seq("doc"), "left_semi"))
    graft.core.PinnedGenerations.pin(bk, shadow, sh)
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.alias("a").join(sh.alias("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("pa"), col("b.doc").as("pb"))
      .agg(count(lit(1)).as("n_inter"))
    shadow
      .join(sizes.select(col("doc").as("shadowed_by"), col("n_sh").as("n_a")), "shadowed_by")
      .join(sizes.select(col("doc").as("dropped_doc"), col("n_sh").as("n_b")), "dropped_doc")
      .join(inter, col("pa") === col("shadowed_by") && col("pb") === col("dropped_doc"),
        "left_outer")
      .select(col("dropped_doc"), col("shadowed_by"),
        expr("(1000000L * coalesce(n_inter, 0L)) div (n_a + n_b - coalesce(n_inter, 0L))")
          .as("jaccard_micro"))
      .orderBy(col("dropped_doc"))
  }

  // x101: per-source quality-percentile normalization — each doc's x7
  // quality score re-expressed as its integer micro-unit percentile
  // WITHIN its source, so a single global keep-threshold compares docs
  // across sources with wildly different raw-score distributions (the
  // normalize-before-threshold step of mixed-source curation).
  //
  // Scale shape — the exact two-pass histogram rank, NOT a per-source
  // window sort: source cardinality is tiny (a handful of crawls) while
  // rows-per-source is the whole corpus, so
  // `row_number().over(partitionBy(source))` would sort billions of rows
  // in ONE task at 100 TB. Instead rank = (# rows of my source scoring
  // strictly below me) + (my position among my score's ties):
  //  - the "below" term cumulates over the per-(source, score) HISTOGRAM
  //    (bounded by score cardinality, never corpus rows — the only
  //    source-partitioned window in the plan runs on this aggregate);
  //  - the tie position is a row_number partitioned by (source, quality,
  //    tie-sub-bucket): tieBuckets=64 range-splits even a degenerate tie
  //    group (a corpus where most docs share one quality value) 64 ways,
  //    so no single score value funnels into one task either.
  // The corpus shuffles on (source, quality) and once more on the tie
  // sub-bucket key; results are bit-identical to the window formulation
  // (PlanSpec pins the shape).
  def x101QualityPercentile(s: SparkSession, dir: String): DataFrame = {
    // no fanOut here (unlike x113): A/B'd +0.09 warm / +0.59 cold — the
    // quality projection already overlaps HistogramRank's own exchanges
    val scored = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        TextFunctions.qualityScore(col("text")).as("quality"))
    graft.operators.HistogramRank.rank(scored, Seq("source"), "quality",
        "doc_id", rankName = "rk", totalName = Some("n"),
        tieBuckets = Some(64))
      .select(col("doc_id"), col("source"), col("quality"),
        expr("CASE WHEN n = 1 THEN 1000000L ELSE ((rk - 1) * 1000000L) div (n - 1) END")
          .as("pct_micro"))
      .orderBy(col("doc_id"))
  }

  // x102: incremental drift monitor — x94's "did the ingest shift" check
  // as a CONTINUOUS process: a persisted unigram profile table absorbs
  // each id-ordered batch through an additive store MERGE (matched c+=c,
  // unmatched insert), and an arriving batch is compared against the
  // profile BEFORE it merges — the alert fires at arrival, not in a
  // nightly rescan. Completes the monitoring pairing the one-shot/
  // incremental families follow (x81/x83, x54/x55, x58/x64). Per batch:
  // one tokenize + count (vocab-sized), one vocab-keyed file-pruned
  // merge, one vocab-sized full-outer compare; corpus rows never rejoin
  // history.
  def x102IncrementalDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    def counts(df: DataFrame) = df
      .select(explode(filter(
        split(TextFunctions.normalizeText(col("text")), " "),
        w => length(w) > 0)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val Seq(b1, b2, b3) = thirdsByDocId(docs)
    val store = Scratch.store(s, "graft_x102_prof")
    Scratch.sealing(store) {
      store.createOrReplace("mon.profile", counts(b1),
        statsFor = Seq("term"))
      store.merge("mon.profile", counts(b2), Seq("term"),
        matched = Seq(graft.operators.MergeInto.MatchedUpdate(None,
          Map("c" -> (col("t.c") + col("s.c"))))),
        notMatched = Seq(graft.operators.MergeInto.NotMatchedInsert(None,
          Map("term" -> col("s.term"), "c" -> col("s.c")))))
      // batch 3 arrives: compare BEFORE merging it
      val batch = counts(b3)
      val prof = store.read("mon.profile")
      val ptot = prof.agg(sum(col("c")).cast("long").as("ptot"))
      val btot = batch.agg(sum(col("c")).cast("long").as("btot"))
      prof.select(col("term"), col("c").as("c_profile"))
        .join(batch.select(col("term"), col("c").as("c_batch")),
          Seq("term"), "full_outer")
        .crossJoin(broadcast(ptot)).crossJoin(broadcast(btot))
        .select(col("term"),
          coalesce(col("c_profile"), lit(0L)).as("c_profile"),
          coalesce(col("c_batch"), lit(0L)).as("c_batch"),
          expr("(coalesce(c_profile, 0L) * 1000000L) div ptot").as("p_profile_micro"),
          expr("(coalesce(c_batch, 0L) * 1000000L) div btot").as("p_batch_micro"))
        .withColumn("delta_micro", abs(col("p_profile_micro") - col("p_batch_micro")))
        .orderBy(col("delta_micro").desc, col("term"))
        .limit(10)
    }
  }

  // x103: join-skew diagnosis — the pre-flight report that decides
  // whether a key needs x15's salting (or AQE skew handling) BEFORE the
  // join melts: per-key row counts reduced map-side, exact p50/p99 of the
  // count distribution, and the top-10 hottest keys with their integer
  // micro-unit share of all rows. One map-side-combined count + one
  // key-cardinality percentile agg + a TakeOrdered; the fact table
  // shuffles once, on the key being diagnosed.
  def x103SkewReport(s: SparkSession, dir: String): DataFrame = {
    val cnts = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
    val stats = cnts.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total_rows"),
      round(expr("percentile(cnt, 0.5)"), 6).as("p50_cnt"),
      round(expr("percentile(cnt, 0.99)"), 6).as("p99_cnt"))
    cnts.orderBy(col("cnt").desc, col("l_orderkey")).limit(10)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("l_orderkey"))))
      .crossJoin(broadcast(stats))
      .select(col("rk"), col("l_orderkey").as("key"), col("cnt"),
        expr("(cnt * 1000000L) div total_rows").as("share_micro"),
        col("n_keys"), col("total_rows"), col("p50_cnt"), col("p99_cnt"))
      .orderBy(col("rk"))
  }

  // x104: auto-salted skew join — x103's pre-flight per-key count DRIVES
  // the remedy instead of informing a human: lineitem keys whose row
  // count crosses the threshold are salted over 8 reducers and only THEIR
  // part partners replicate; cold keys pay nothing. x15 salts a
  // known-skewed aggregation by hand; this closes the diagnose→salt loop
  // automatically, and the result is bit-identical to the plain equi-join
  // (the oracle IS the plain join — salt may never leak into semantics).
  def x104SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey").as("p_partkey"), col("l_quantity"))
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    graft.operators.Salting.autoSaltedJoin(li, p, Seq("p_partkey"),
        hotThreshold = 40L, buckets = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity").cast("decimal(18,6)")), 6).cast("double").as("sum_qty"))
      .orderBy(col("p_brand"))
  }

  // x105: data-constrained epoch planning (Muennighoff et al. 2023 shape) —
  // given a token budget of 2x the corpus and a 3-epoch repetition cap,
  // allocate repeated epochs per source in mean-quality order: the best
  // sources repeat up to the cap, the budget boundary source gets a
  // partial epoch, everything past it gets none. All arithmetic is BIGINT
  // micro-units (exact). The only row-data work is one source-keyed agg;
  // the cumulative window runs over the SOURCE-cardinality frame (a
  // handful of crawls/corpora), never over documents — same scale shape
  // as x95's water-fill.
  def x105EpochPlan(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val norm = TextFunctions.normalizeText(col("text"))
    val perSrc = t(s, dir, "documents")
      .select(col("source"),
        round(TextFunctions.qualityScore(col("text")) * 1000000).cast("long").as("qm"),
        size(filter(split(norm, " "), w => length(w) > 0)).cast("long").as("tk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("tokens"),
        expr("sum(qm) div count(1)").as("quality_micro"))
    val budget = perSrc.agg((sum(col("tokens")) * 2).as("budget"))
    perSrc.crossJoin(broadcast(budget))
      .withColumn("before", coalesce(sum(col("tokens") * 3).over(
        W.orderBy(col("quality_micro").desc, col("source"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .withColumn("alloc_tokens",
        greatest(lit(0L), least(col("tokens") * 3, col("budget") - col("before"))))
      .select(col("source"), col("n_docs"), col("tokens"), col("quality_micro"),
        col("alloc_tokens"),
        expr("CASE WHEN tokens = 0 THEN 0L ELSE (alloc_tokens * 1000000L) div tokens END")
          .as("epochs_micro"))
      .orderBy(col("source"))
  }

  // x106: quality-canonical near-dup representative — x22 finds the
  // clusters and x28 keeps the FIRST-seen member; a curation run instead
  // keeps the BEST member. One cluster-keyed max(struct(quality, -id))
  // agg picks argmax(quality, tie -> smallest id) per cluster: no window,
  // no per-cluster sort, and the struct-max combines map-side.
  def x106BestOfCluster(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
        n = 3, bands = 4, rows = 2, threshold = 0.6)
      .select(col("doc_a"), col("doc_b"))
    val scored = docs.select(col("doc_id"),
      round(TextFunctions.qualityScore(col("text")) * 1000000).cast("long").as("quality_micro"))
    Dedup.dupClusters(docs.select(col("doc_id")), pairs, "doc_id")
      .join(scored, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(struct(col("quality_micro"), (-col("doc_id")).as("neg"))).as("best"))
      .select(col("cluster_id"), col("n_docs"),
        (-col("best.neg")).as("rep_doc"),
        col("best.quality_micro").as("rep_quality_micro"))
      .orderBy(col("cluster_id"))
  }

  // x107: per-source document quota (RefinedWeb-style host cap) — keep at
  // most 15 docs per source, chosen by a deterministic md5 order so the
  // kept set is content-independent, reproducible and engine-portable.
  // Selection reuses x101's histogram-rank shape: a 256-bucket hash
  // histogram per source gives every row its exact global rank as
  // below(bucket) + rank-within-bucket, so no source ever funnels into
  // one task (the bucket width is the dial: more top bits at higher
  // per-source cardinality). The oracle is the straightforward
  // per-source window rank — bit-identical by construction.
  def x107SourceCap(s: SparkSession, dir: String): DataFrame = {
    val cap = 15L
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      .withColumn("hash60",
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"))
    graft.operators.HistogramRank.rank(docs, Seq("source"), "hash60", "doc_id",
        bucket = Some(graft.operators.HistogramRank.hashBuckets(52)))
      .filter(col("rank") <= cap)
      .select(col("doc_id"), col("source"), col("hash60"))
      .orderBy(col("doc_id"))
  }

  // x108: the drift monitor as a STREAM — x94 is the one-shot rescan,
  // x102 the incremental at-arrival compare driven by sequential calls;
  // x108 closes the family with the push model: store commits drive
  // micro-batches through the graft-table DSv2 source and
  // StreamingDrift's foreachBatch compares each batch against the
  // profile of everything before it, exactly-once (batch-id-labeled
  // commits), BEFORE absorbing it. The third commit's at-arrival report
  // must equal x102's batch replay bit-for-bit — they share one oracle.
  def x108DriftStream(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val Seq(b1, b2, b3) = thirdsByDocId(docs)
    val store = Scratch.store(s, "graft_x108")
    val ckpt = Scratch.dir("graft_x108_ckpt")
    Scratch.sealing(store, Seq(ckpt)) {
      store.createOrReplace("stream.docs", b1)
      val q = graft.streaming.StreamingDrift.driftSink(
          s.readStream.format("graft-table")
            .option("root", store.rootDir).option("table", "stream.docs").load(),
          store, "mon.profile", "mon.drift", "text", topK = 10)
        .option("checkpointLocation", ckpt)
        .start()
      try {
        q.processAllAvailable()
        store.append("stream.docs", b2)
        q.processAllAvailable()
        store.append("stream.docs", b3)
        q.processAllAvailable()
      } finally q.stop()
      val drift = store.read("mon.drift")
      val last = drift.agg(max(col("batch_id"))).head().getLong(0)
      drift.filter(col("batch_id") === last)
        .select(col("term"), col("c_profile"), col("c_batch"),
          col("p_profile_micro"), col("p_batch_micro"), col("delta_micro"))
        .orderBy(col("delta_micro").desc, col("term"))
    }
  }

  // x109: the per-source quota as a CONTINUOUS process — x107's one-shot
  // cap maintained incrementally: a store table holds each source's
  // current kept set (its cap lowest md5 hashes) and an arriving batch
  // can only EVICT members, never rescan history. Per batch: rank the
  // batch's own per-source top-cap (HistogramRank over just the batch),
  // union it with the cap-bounded kept table, keep the union's top-cap.
  // Convergence is exact because lowest-cap-by-hash is associative — the
  // incremental union of per-batch minima equals the one-shot quota — so
  // x109 shares x107's oracle bit-for-bit. At 100 TB a batch costs one
  // batch-sized histogram rank plus a (sources x 2cap)-frame re-rank.
  def x109IncrementalQuota(s: SparkSession, dir: String): DataFrame = {
    val HR = graft.operators.HistogramRank
    val cap = 15L
    def topCap(df: DataFrame) =
      HR.rank(df, Seq("source"), "hash60", "doc_id",
          bucket = Some(HR.hashBuckets(52)))
        .filter(col("rank") <= cap).drop("rank")
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      .withColumn("hash60",
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"))
    val batches = thirdsByDocId(docs)
    val store = Scratch.store(s, "graft_x109")
    Scratch.sealing(store) {
      batches.foreach { b =>
        val union = if (store.exists("quota.kept"))
          store.read("quota.kept").unionByName(topCap(b)) else topCap(b)
        // materialize BEFORE the replace — the new kept set reads the
        // table it is about to supersede; once written, the store copy
        // is authoritative and the scratch blocks are released (the
        // dupClusters superseded-checkpoint pattern)
        val kept = topCap(union).materialized
        store.createOrReplace("quota.kept", kept)
        org.apache.spark.sql.GraftShims.unpersistCheckpoint(kept, deleteFiles = true)
      }
      store.read("quota.kept")
        .select(col("doc_id"), col("source"), col("hash60"))
        .orderBy(col("doc_id"))
    }
  }

  // x110: PII scan + redaction — the compliance pass before export. The
  // synthetic corpus carries no PII, so the query first INJECTS
  // deterministic email/phone/IP/SSN/card/IBAN tokens keyed off doc_id
  // (the fixture, mirrored verbatim in the oracle); the operator under
  // test is the scan/redact projection itself: stock codegen regexps,
  // zero shuffle — at 100 TB this rides the export scan for free.
  def x110PiiScan(s: SparkSession, dir: String): DataFrame = {
    val ids = col("doc_id").cast("string")
    def p(m: Int, w: Int) = lpad((col("doc_id") % m).cast("string"), w, "0")
    val aug = concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), ids, lit("@example.com now"))).otherwise(lit("")),
      when(col("doc_id") % 6 === 0,
        concat(lit(" or admin"), ids, lit("@test.org"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" cc Ops.Team"), ids, lit("@Example.COM"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call 415-555-"), p(10000, 4))).otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" host 10."), (col("doc_id") % 256).cast("string"),
          lit(".0.1 up"))).otherwise(lit("")),
      when(col("doc_id") % 9 === 0,
        concat(lit(" ssn "), p(1000, 3), lit("-"), p(100, 2), lit("-"),
          p(10000, 4))).otherwise(lit("")),
      // two card shapes: dash-grouped 16-digit, and a bare digit run
      when(col("doc_id") % 13 === 0,
        concat(lit(" card 4"), p(1000, 3), lit("-"), p(10000, 4), lit("-"),
          p(10000, 4), lit("-"), p(10000, 4))).otherwise(lit("")),
      when(col("doc_id") % 17 === 0,
        concat(lit(" pan 37"), p(10000, 4), p(10000, 4), p(100000, 5))
        ).otherwise(lit("")),
      // Amex in its conventional 4-6-5 separator grouping — has no
      // 4-digit middle group, so only the rule's 4-6-5 alternative sees it
      when(col("doc_id") % 23 === 0,
        concat(lit(" amex 37"), p(100, 2), lit("-"), p(1000000, 6),
          lit("-"), p(100000, 5))).otherwise(lit("")),
      // letters interleave the IBAN body so its digit runs stay under the
      // card rule's 13-digit floor — the fixture tests each rule alone
      when(col("doc_id") % 19 === 0,
        concat(lit(" iban DE"), p(100, 2), lit("BANK"), p(100000000, 8),
          lit("X end"))).otherwise(lit("")))
    graft.operators.Pii.scan(
        t(s, dir, "documents").select(col("doc_id"), aug.as("text")),
        "doc_id", "text")
      .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_phone"),
        col("n_ssn"), col("n_cc"), col("n_iban"),
        col("n_pii"), md5(col("redacted")).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  // x111: cross-source duplicate-overlap matrix — for every source pair,
  // how many near-dup pairs (x3's exact LSH parameters) span them and
  // their verified-Jaccard mass: the provenance/licensing view that says
  // which corpora are re-crawls of each other. Candidates come from the
  // band-bucket join (never a corpus cross join); the matrix frame is
  // source²-bounded, so the final agg is broadcast-tiny at any corpus
  // size.
  def x111SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val src = docs.select(col("doc_id"), col("source"))
    Dedup.minhashLsh(docs, "doc_id", "text", n = 3, bands = 4, rows = 2,
        threshold = 0.6)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
      .select(least(col("sa"), col("sb")).as("source_lo"),
        greatest(col("sa"), col("sb")).as("source_hi"),
        round(col("jaccard") * 1000000).cast("long").as("jm"))
      .groupBy(col("source_lo"), col("source_hi"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("jm")).as("jaccard_mass_micro"))
      .orderBy(col("source_lo"), col("source_hi"))
  }

  // x112: memorization-risk report — per document, how much of it is
  // corpus-UNIQUE at the 5-gram level (df = 1): the docs most at risk of
  // verbatim regurgitation if leaked secrets live in them, and the
  // flip-side diversity signal. Shingles travel as 60-bit md5 hashes
  // (never strings) through the df agg and join; per-doc aggregation
  // combines map-side. Two hash shuffles total, both on compact keys.
  /** x112's distinct hashed-shingle frame (doc, shh). */
  private[graft] def memorizationShingles(s: SparkSession, dir: String): DataFrame =
    Dedup.shingles(t(s, dir, "documents"), "doc_id", "text", n = 5)
      .select(col("doc"), Dedup.shingleHash(col("shingle")).as("shh"))
      .distinct()

  /** x112's lazy plan over a shingle frame — split out so PlanSpec can pin
    * the shape (the query itself persists the frame and materializes the
    * result, which truncates the executed plan). */
  private[graft] def memorizationRiskPlan(sh: DataFrame): DataFrame = {
    val df = sh.groupBy(col("shh")).agg(count(lit(1)).as("df"))
    sh.join(df, "shh")
      .groupBy(col("doc").as("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"),
        max(col("df")).as("max_df"))
      .withColumn("risk_micro", expr("n_unique * 1000000L div n_sh"))
      .orderBy(col("doc_id"))
  }

  def x112MemorizationRisk(s: SparkSession, dir: String): DataFrame = {
    // pinned through the input-keyed LRU (the x100 note): the returned
    // frame stays lazy over the shingle cache, repeated calls reuse it,
    // and the per-call result materialization this bought is gone
    val sh = graft.core.PinnedGenerations.persistPinned(
      memorizationShingles(s, dir))
    graft.core.PinnedGenerations.pin(sh)
    memorizationRiskPlan(sh)
  }

  // x113: curriculum export order — ONE deterministic total order over
  // the corpus (easy→hard by quality bucket, hash-shuffled within a
  // bucket) with every document's exact global position, WITHOUT a
  // global sort: HistogramRank with no partition columns buckets the
  // composite key's top bits, so the only row-data windows partition by
  // bucket (≲2k buckets of corpus/2k rows each) and the bucket histogram
  // itself is the single-task frame (bounded by bucket count, never by
  // rows). x56 shards for parallel readers; x113 is the single-sequence
  // twin a curriculum schedule needs.
  def x113CurriculumOrder(s: SparkSession, dir: String): DataFrame = {
    val HR = graft.operators.HistogramRank
    // fanOut before the regex-heavy quality projection: a low-split scan
    // (single-row-group file) otherwise runs it in one task (§2.5)
    val keyed = graft.sources.Tables.fanOut(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        col("doc_id"))
      .select(col("doc_id"),
        round(TextFunctions.qualityScore(col("text")) * 1000000).cast("long").as("qm"),
        conv(substring(md5(concat(lit("curr|"), col("doc_id").cast("string"))), 1, 13),
          16, 10).cast("long").as("h52"))
      .withColumn("qb", least(expr("qm div 125000"), lit(7L)))
      // composite order key (qb, h52) packed into one long: qb ≤ 7 in the
      // top bits, 52 hash bits below — monotone in (qb, h52) by layout
      .withColumn("ckey", shiftleft(col("qb"), 53) + col("h52"))
    HR.rank(keyed, Seq.empty, "ckey", "doc_id",
        bucket = Some(HR.hashBuckets(45)), rankName = "pos")
      .select(col("doc_id"), col("qb"), col("pos"))
      .orderBy(col("doc_id"))
  }

  // x114: per-source corpus datasheet — the "datasheets for datasets"
  // summary a released corpus ships (Gebru et al. 2021): per source, the
  // volume (docs/tokens/chars), mean quality, the modal language with
  // its share, and the corpus-wide exact-duplicate exposure. Every
  // statistic is a map-side-combined agg keyed on source, (source,lang)
  // or the 60-bit text hash; the assembly joins run on SOURCE-cardinality
  // frames — a handful of rows at any corpus size — so the whole report
  // costs three corpus scans, no row-data window, no wide shuffle.
  def x114SourceDatasheet(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // corpus-wide exact-dup exposure: docs whose full-text hash occurs >= 2
    // times anywhere (cross-source aware), counted per source
    val th = docs.select(col("source"), Dedup.shingleHash(col("text")).as("h"))
    val dup = th.join(
        th.groupBy(col("h")).agg(count(lit(1)).as("df")).filter(col("df") >= 2), "h")
      .groupBy(col("source")).agg(count(lit(1)).as("dup_docs"))
    datasheetAssemble(datasheetStatFrame(docs),
      datasheetLangMode(
        docs.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("lc"))),
      dup)
  }

  /** Shared x114/x118 datasheet pieces — the one-shot and its incremental
    * twin must stay bit-for-bit identical (the shared `DatasheetSql`
    * oracle pins it), so every shared computation lives here exactly
    * once. Per-source volume + quality sums (map-side combined): */
  private def datasheetStatFrame(b: DataFrame): DataFrame = {
    val norm = TextFunctions.normalizeText(col("text"))
    b.select(col("source"),
        size(filter(split(norm, " "), w => length(w) > 0)).cast("long").as("tk"),
        length(col("text")).cast("long").as("ch"),
        round(TextFunctions.qualityScore(col("text")) * 1000000).cast("long").as("qm"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("n_tokens"),
        sum(col("ch")).as("n_chars"), sum(col("qm")).as("sum_q"))
  }

  /** Modal language per source: struct-min argmax (largest count, tie ->
    * smallest lang) over a (source, lang, lc) frame — no window. */
  private def datasheetLangMode(lm: DataFrame): DataFrame =
    lm.groupBy(col("source"))
      .agg(min(struct((-col("lc")).as("neg"), col("lang").as("lang"))).as("m"),
        sum(col("lc")).as("nd"))
      .select(col("source"), col("m.lang").as("top_lang"),
        expr("(-m.neg) * 1000000 div nd").as("top_lang_share_micro"))

  /** Final datasheet assembly over source-cardinality frames. */
  private def datasheetAssemble(stats: DataFrame, langMode: DataFrame,
      dup: DataFrame): DataFrame =
    stats.withColumn("mean_quality_micro", expr("sum_q div n_docs"))
      .join(dup, Seq("source"), "left_outer").na.fill(0L, Seq("dup_docs"))
      .join(langMode, "source")
      .withColumn("dup_rate_micro", expr("dup_docs * 1000000 div n_docs"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("mean_quality_micro"), col("top_lang"), col("top_lang_share_micro"),
        col("dup_docs"), col("dup_rate_micro"))
      .orderBy(col("source"))


  // x115: ANN recall report — the evaluation harness that says whether
  // an approximate index is good enough to ship: per query, the LSH
  // top-k (x21's deterministic buckets) scored against the brute-force
  // top-k ground truth (x5); hits and recall@k in integer micro-units.
  // Retrieval does all the work (both sides corpus-linear with the
  // query set broadcast); the reconciliation joins run on
  // (queries × k)-sized frames. At corpus scale the query set IS the
  // evaluation sample, so the report costs the sample, never the index.
  def x115AnnRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity.lshTopK(emb, q, k = 5, nBits = 4, dim = 64)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(approx.groupBy(col("query_id")).agg(count(lit(1)).as("n_lsh")),
        Seq("query_id"), "left_outer")
      .join(hits, Seq("query_id"), "left_outer")
      .na.fill(0L, Seq("n_lsh", "hits"))
      .withColumn("recall_micro", expr("hits * 1000000 div n_exact"))
      .orderBy(col("query_id"))
  }

  // x117: dedup-threshold sensitivity sweep — one pass over the LSH
  // band-bucket candidates (scored ONCE) answers "how aggressive should
  // near-dup removal be" for a whole rung ladder at a time: per jaccard
  // threshold, how many pairs survive, their jaccard mass and how many
  // docs are touched. The ladder is a 5-row literal frame; the explode
  // multiplies only the CANDIDATE set (band-bounded, never corpus²), so
  // the sweep costs what a single-threshold run costs plus a 5× fan-out
  // of the candidate rows.
  def x117ThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text",
        n = 3, bands = 4, rows = 2, threshold = 0.0)
      .select(round(col("jaccard") * 1000000).cast("long").as("jm"),
        col("doc_a"), col("doc_b"))
    val rungMicros = (5 to 9).map(_ * 100000L)
    val rungs = rungMicros.toDF("thr_micro")
    val kept = pairs.select(
        explode(array(rungMicros.map(lit(_)): _*)).as("thr_micro"),
        col("jm"), col("doc_a"), col("doc_b"))
      .filter(col("jm") >= col("thr_micro"))
    val base = kept.groupBy(col("thr_micro"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("jm")).as("jaccard_mass_micro"))
    val docsIn = kept
      .select(col("thr_micro"), explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .distinct()
      .groupBy(col("thr_micro")).agg(count(lit(1)).as("n_docs_involved"))
    rungs.join(base, Seq("thr_micro"), "left_outer")
      .join(docsIn, Seq("thr_micro"), "left_outer")
      .na.fill(0L, Seq("n_pairs", "jaccard_mass_micro", "n_docs_involved"))
      .orderBy(col("thr_micro"))
  }

  // x118: incremental per-source datasheet — x114 as a CONTINUOUS process
  // (the one-shot→incremental pairing of x107→x109 and x94→x102): id-
  // ordered ingest batches maintain store tables so the release summary is
  // always current WITHOUT rescanning history.
  //  - ds.stats (source → docs/tokens/chars/sum-quality) and ds.langs
  //    ((source, lang) → count): associative adds via file-pruned MERGE;
  //  - exact-dup exposure is NOT associative — a new doc can flip an OLD
  //    singleton into a dup — so ds.hashes holds per-(hash, source) counts
  //    and each batch point-reads ONLY its touched hashes (box+bloom
  //    pruned, the x83 probe shape) and applies the threshold-crossing
  //    delta: docs of hash h are dups exactly when total(h) ≥ 2, so
  //    Δ(s) = Σ_h c_new(h,s)·1{newTot≥2} − c_old(h,s)·1{oldTot≥2}.
  // The final frame must equal x114's one-shot datasheet bit-for-bit
  // (shared oracle). At 100 TB a batch costs the batch: three batch-sized
  // aggs, a touched-hash point probe and candidate-bounded merges.
  def x118IncrementalDatasheet(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val batches = thirdsByDocId(docs)
    val store = Scratch.store(s, "graft_x118")
    Scratch.sealing(store) {
      batches.foreach(b => datasheetIngest(store, b))
      datasheetAssemble(store.read("ds.stats"),
        datasheetLangMode(store.read("ds.langs")), store.read("ds.dup"))
    }
  }

  /** One x118 ingest batch: associative MERGEs for stats/langs, the
    * touched-hash crossing delta for dup exposure — all four index
    * merges staged into ONE store transaction, so the batch lands
    * everywhere or nowhere: a crash between merges can never leave stats
    * absorbed but dup exposure not (the incremental twin would silently
    * diverge from x114 until a re-run). Empty-schema seeds stay outside
    * the transaction — an empty table is a harmless pre-state. */
  private[graft] def datasheetIngest(store: graft.tables.TableStore, b: DataFrame): Unit = {
    import graft.operators.MergeInto.{MatchedUpdate, NotMatchedInsert}
    // NOTE (r17): materializing stats/langs/delta here (the x121/x122
    // one-localCheckpoint-per-batch fix) was A/B'd and REGRESSED x118
    // (warm 7.7→9.0, cold 12.7→15.5): these four merges stage CONCURRENTLY
    // inside one transaction, so their 3x source re-evaluations already
    // overlap across idle cores, while eager localCheckpoints serialize
    // into sync points between the probe and the merges. Serial-merge
    // ingest units (x121/x122) keep the materialization; this one stays
    // lazy on purpose.
    val stats = datasheetStatFrame(b)
    if (!store.exists("ds.stats"))
      store.createOrReplace("ds.stats", stats.limit(0), statsFor = Seq("source"))
    val langs = b.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("lc"))
    if (!store.exists("ds.langs"))
      store.createOrReplace("ds.langs", langs.limit(0), statsFor = Seq("source"))
    // dup exposure: per-(hash, source) batch counts against the touched
    // slice of the persisted hash index
    val bc = b.select(col("source"), Dedup.shingleHash(col("text")).as("h"))
      .groupBy(col("h"), col("source")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = bc.select(col("h")).distinct()
    val old =
      if (store.exists("ds.hashes")) {
        val (idx, _) = store.readPointPruned("ds.hashes", touched, Seq("h"))
        idx.join(touched, Seq("h"), "left_semi")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      } else bc.limit(0)
    val oldTot = old.groupBy(col("h")).agg(sum(col("c")).as("old_tot"))
    val tot = bc.groupBy(col("h")).agg(sum(col("c")).as("b_tot"))
      .join(oldTot, Seq("h"), "left_outer").na.fill(0L, Seq("old_tot"))
      .withColumn("new_tot", col("b_tot") + col("old_tot"))
    val plus = old.unionByName(bc)
      .groupBy(col("h"), col("source")).agg(sum(col("c")).as("cn"))
      .join(tot.filter(col("new_tot") >= 2).select(col("h")), "h")
      .groupBy(col("source")).agg(sum(col("cn")).as("p"))
    val minus = old
      .join(tot.filter(col("old_tot") >= 2).select(col("h")), "h")
      .groupBy(col("source")).agg(sum(col("c")).as("m"))
    val delta = plus.join(minus, Seq("source"), "full_outer")
      .na.fill(0L, Seq("p", "m"))
      .select(col("source"), (col("p") - col("m")).as("d"))
      .filter(col("d") =!= 0L)
    if (!store.exists("ds.dup"))
      store.createOrReplace("ds.dup",
        delta.select(col("source"), col("d").as("dup_docs")).limit(0),
        statsFor = Seq("source"))
    if (!store.exists("ds.hashes")) {
      // the bloom is what keeps the touched-hash probe flat as history
      // grows: h is a uniform 60-bit hash, so every file's [min,max] box
      // spans the full range and the box stage alone prunes nothing
      store.createOrReplace("ds.hashes", bc.limit(0), statsFor = Seq("h"))
      store.setBloomFilterIndex("ds.hashes", Seq("h"), ndv = 1000000L)
    }
    // the batch's atomic publish: every merge reads pre-transaction state
    // (the dup delta was computed against the OLD hash index above, which
    // is exactly the crossing-delta contract) and all four tables swap
    // together under the transaction's locks. The four stagings write
    // four INDEPENDENT tables, so they run concurrently (Txn's ledger is
    // synchronized; Spark schedules jobs from many threads) — the batch's
    // wall time is the slowest index, not the sum. Failures are collected
    // AFTER every staging settles, so the abort sees every staged dir.
    // The unpersists live in the finally: a failed-and-retried batch must
    // not accumulate dead blocks.
    try store.transaction { txn =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val stagings = Seq(
        Future(txn.merge("ds.stats", stats, Seq("source"),
          matched = Seq(MatchedUpdate(None, Map(
            "n_docs" -> (col("t.n_docs") + col("s.n_docs")),
            "n_tokens" -> (col("t.n_tokens") + col("s.n_tokens")),
            "n_chars" -> (col("t.n_chars") + col("s.n_chars")),
            "sum_q" -> (col("t.sum_q") + col("s.sum_q"))))),
          notMatched = Seq(NotMatchedInsert(None, Map(
            "source" -> col("s.source"), "n_docs" -> col("s.n_docs"),
            "n_tokens" -> col("s.n_tokens"), "n_chars" -> col("s.n_chars"),
            "sum_q" -> col("s.sum_q")))))),
        Future(txn.merge("ds.langs", langs, Seq("source", "lang"),
          matched = Seq(MatchedUpdate(None, Map("lc" -> (col("t.lc") + col("s.lc"))))),
          notMatched = Seq(NotMatchedInsert(None, Map(
            "source" -> col("s.source"), "lang" -> col("s.lang"),
            "lc" -> col("s.lc")))))),
        Future(txn.merge("ds.dup", delta, Seq("source"),
          matched = Seq(MatchedUpdate(None,
            Map("dup_docs" -> (col("t.dup_docs") + col("s.d"))))),
          notMatched = Seq(NotMatchedInsert(None, Map(
            "source" -> col("s.source"), "dup_docs" -> col("s.d")))))),
        Future(txn.merge("ds.hashes", bc, Seq("h", "source"),
          matched = Seq(MatchedUpdate(None, Map("c" -> (col("t.c") + col("s.c"))))),
          notMatched = Seq(NotMatchedInsert(None, Map(
            "h" -> col("s.h"), "source" -> col("s.source"), "c" -> col("s.c")))))))
      val settled = stagings.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
      settled.collectFirst { case scala.util.Failure(t) => throw t }
    } finally {
      old.unpersist(false)
      bc.unpersist(false)
    }
  }

  // x119: per-benchmark contamination report — x30 flags WHICH corpus
  // docs overlap the held-out set; the eval-integrity audit a training
  // run publishes wants it AGGREGATED: for every (benchmark, corpus
  // source), how many training docs carry >= 3 of that benchmark's
  // 3-grams, the per-source contamination rate, and the leaked n-gram
  // mass — zero rows included (an audit that omits clean cells can't
  // prove it checked them). The benchmark suite is x30's held-out
  // doc_id % 13 slice, one benchmark per eval language. Scale shape:
  // tagged benchmark shingles broadcast ONLY under the size gate (token
  // mass <= Dedup.DefaultBroadcastMaxTokens — an oversized benchmark
  // degrades to a shuffled equi-join instead of OOMing the driver); the
  // corpus pays one explode; the report frame is benchmark x source
  // (see Dedup.contaminationReport).
  def x119ContaminationReport(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.contaminationReport(
        corpus = docs.filter(col("doc_id") % 13 =!= 0),
        benchmark = docs.filter(col("doc_id") % 13 === 0)
          .select(col("lang").as("benchmark"), col("text")),
        idCol = "doc_id", textCol = "text",
        groupCol = "source", benchCol = "benchmark",
        n = 3, threshold = 3L)
      .orderBy(col("benchmark"), col("source"))
  }

  // x122: x119 as a CONTINUOUS process — the one-shot→incremental pairing
  // of x107→x109 / x114→x118 / x120→x121 applied to the eval-integrity
  // audit: the benchmark suite is FROZEN (a moving target would change
  // what the audit measures) and each arriving corpus batch pays one
  // batch-sized contamination report MERGEd into the per-(benchmark,
  // source) accumulator. Every column is batch-associative — a doc's
  // n-gram overlap completes within its own batch (per-doc shingles never
  // span batches), so the >= threshold test per doc is decided there too
  // — and the micro-rate is derived from the accumulated sums at read
  // time, so the report converges bit-for-bit to x119's one-shot (shared
  // oracle). History is never rescanned, and the FROZEN suite's cost is
  // paid once: Dedup.prepareBenchmark runs the size-gate aggregate and
  // builds (and caches) the tagged shingle relation up front, so each
  // arriving batch pays only its own corpus-side probe — not a redundant
  // benchmark scan + shingle explode per batch.
  /** One corpus batch folded into the contamination accumulator — the
    * batch-sized unit x122 pays per arrival (shared with the
    * sf1-equivalent smoke, which drives 12 batches through it). */
  def contaminationIngestBatch(store: graft.tables.TableStore, table: String,
      prep: Dedup.PreparedBenchmark, batch: DataFrame): Unit = {
    import graft.operators.MergeInto.{MatchedUpdate, NotMatchedInsert}
    // materialized ONCE (localCheckpoint, benchmark×source-sized): the
    // MERGE below otherwise re-runs the batch's contamination probe 3x
    // (candidate stats, discovery join, staged write) — see
    // TableStore.mergeInternal's r17 A/B note for why localCheckpoint
    // and not persist
    import graft.core.Materialize.MatOps
    val rep = Dedup.contaminationProbe(prep, batch,
        "doc_id", "text", "source", threshold = 3L)
      .select(col("benchmark"), col("source"), col("n_docs"),
        col("n_contaminated"), col("overlap_ngrams"))
      .materialized
    if (!store.exists(table)) store.createOrReplace(table, rep)
    else store.merge(table, rep, Seq("benchmark", "source"),
      matched = Seq(MatchedUpdate(None, Map(
        "n_docs" -> (col("t.n_docs") + col("s.n_docs")),
        "n_contaminated" -> (col("t.n_contaminated") + col("s.n_contaminated")),
        "overlap_ngrams" -> (col("t.overlap_ngrams") + col("s.overlap_ngrams"))))),
      notMatched = Seq(NotMatchedInsert(None, Map(
        "benchmark" -> col("s.benchmark"), "source" -> col("s.source"),
        "n_docs" -> col("s.n_docs"),
        "n_contaminated" -> col("s.n_contaminated"),
        "overlap_ngrams" -> col("s.overlap_ngrams")))))
  }

  def x122IncrementalContamination(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 13 =!= 0)
    val bench = docs.filter(col("doc_id") % 13 === 0)
      .select(col("lang").as("benchmark"), col("text"))
    val batches = thirdsByDocId(corpus)
    val store = Scratch.store(s, "graft_x122")
    val prep = Dedup.prepareBenchmark(bench, "text", "benchmark", n = 3)
    try Scratch.sealing(store) {
      batches.foreach(b =>
        contaminationIngestBatch(store, "audit.contam", prep, b))
      store.read("audit.contam")
        .withColumn("contaminated_micro",
          expr("(1000000 * n_contaminated) div n_docs"))
        .select(col("benchmark"), col("source"), col("n_docs"),
          col("n_contaminated"), col("contaminated_micro"), col("overlap_ngrams"))
        .orderBy(col("benchmark"), col("source"))
    } finally prep.release()
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x122_incremental_contamination" -> x122IncrementalContamination _,
    "x119_contamination_report" -> x119ContaminationReport _,
    "x118_incremental_datasheet" -> x118IncrementalDatasheet _,
    "x117_threshold_sweep" -> x117ThresholdSweep _,
    "x115_ann_recall" -> x115AnnRecall _,
    "x114_source_datasheet" -> x114SourceDatasheet _,
    "x113_curriculum_order" -> x113CurriculumOrder _,
    "x112_memorization_risk" -> x112MemorizationRisk _,
    "x111_source_overlap" -> x111SourceOverlap _,
    "x110_pii_scan" -> x110PiiScan _,
    "x109_incremental_quota" -> x109IncrementalQuota _,
    "x108_drift_stream" -> x108DriftStream _,
    "x107_source_cap" -> x107SourceCap _,
    "x106_best_of_cluster" -> x106BestOfCluster _,
    "x105_epoch_plan" -> x105EpochPlan _,
    "x104_salted_join" -> x104SaltedJoin _,
    "x103_skew_report" -> x103SkewReport _,
    "x102_incremental_drift" -> x102IncrementalDrift _,
    "x101_quality_percentile" -> x101QualityPercentile _,
    "x100_dedup_audit" -> x100DedupAudit _,
    "x99_mixed_lang" -> x99MixedLang _,
    "x97_fuzzy_lookup" -> x97FuzzyLookup _,
    "x95_water_fill" -> x95WaterFill _,
    "x96_cluster_weights" -> x96ClusterWeights _,
    "x94_drift" -> x94Drift _,
    "x92_textrank" -> x92TextRank _,
    "x93_label_prop" -> x93LabelProp _,
    "x88_top_paths" -> x88TopPaths _,
    "x89_kcore" -> x89KCore _,
    "x84_fuzzy_join" -> x84FuzzyJoin _,
    "x85_triangles" -> x85Triangles _,
    "x86_length_buckets" -> x86LengthBuckets _,
    "x87_transitions" -> x87Transitions _,
    "x74_span_corruption" -> x74SpanCorruption _,
    "x69_pmi_bigrams" -> x69PmiBigrams _,
    "x70_inverted_index" -> x70InvertedIndex _,
    "x71_weighted_sample" -> x71WeightedSample _,
    "x65_hard_negatives" -> x65HardNegatives _,
    "x66_leakage_split" -> x66LeakageSplit _,
    "x67_token_budget" -> x67TokenBudget _,
    "x50_quality_buckets" -> x50QualityBuckets _,
    "x51_bigram_fluency" -> x51BigramFluency _,
    "x52_dsir_select" -> x52DsirSelect _,
    "x53_token_ids" -> x53TokenIds _,
    "x54_corpus_profile" -> x54CorpusProfile _,
    "x55_incremental_profile" -> x55IncrementalProfile _,
    "x56_shard_layout" -> x56ShardLayout _,
    "x57_embed_decontam" -> x57EmbedDecontam _,
    "x58_segment_dedup" -> x58SegmentDedup _,
    "x59_export_manifest" -> x59ExportManifest _,
    "x61_expectations" -> x61Expectations _,
    "x62_streaming_quality" -> x62StreamingQuality _,
    "x63_quarantine_replay" -> x63QuarantineReplay _,
    "x64_incremental_segments" -> x64IncrementalSegments _,
    "x47_hybrid_retrieval" -> x47HybridRetrieval _,
    "x34_bm25_topk" -> x34Bm25TopK _,
    "x35_seq_packing" -> x35SeqPacking _,
    "x38_countmin" -> x38CountMin _,
    "x39_gap_fill" -> x39GapFill _,
    "x40_chunking" -> x40Chunking _,
    "x41_mixture" -> x41Mixture _,
    "x42_incremental_medallion" -> x42IncrementalMedallion _,
    "x43_negative_sampling" -> x43NegativeSampling _,
    "x44_gopher_rep" -> x44GopherRepetition _,
    "x33_table_stream" -> x33TableStream _,
    "x30_decontaminate" -> x30Decontaminate _,
    "x31_stratified_sample" -> x31StratifiedSample _,
    "x32_top_terms" -> x32TopTerms _,
    "x22_dup_clusters" -> x22DupClusters _,
    "x26_curation" -> x26Curation _,
    "x23_text_clean" -> x23TextClean _,
    "x24_repetition" -> x24Repetition _,
    "x20_dataset_split" -> x20DatasetSplit _,
    "x28_firstseen_dedup" -> x28FirstSeenDedup _,
    "x46_incremental_dedup" -> x46IncrementalDedup _,
    "x49_span_dedup" -> x49SpanDedup _,
    "x1_dedup_exact" -> x1DedupExact _,
    "x2_ngram_jaccard" -> x2NgramJaccard _,
    "x3_minhash_lsh" -> x3MinhashLsh _,
    "x4_simhash_pairs" -> x4SimhashPairs _,
    "x5_ann_topk" -> x5AnnTopK _,
    "x6_embed_neardup" -> x6EmbedNearDup _,
    "x7_text_stats" -> x7TextStats _,
    "x8_lang_id" -> x8LangId _,
    "x9_fingerprint" -> x9Fingerprint _,
    "x10_media_features" -> x10MediaFeatures _,
    "x79_mmr_select" -> x79MmrSelect _,
    "x80_quality_outliers" -> x80QualityOutliers _,
    "x81_shingle_novelty" -> x81ShingleNovelty _,
    "x83_incremental_novelty" -> x83IncrementalNovelty _)

  private val Norm = """regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"""

  /** `base` + `q` CTE pair computing the per-document quality score in
    * SQL — [[TextFunctions.qualityScore]]'s DuckDB twin (shared by the
    * x101/x105/x106 oracles). */
  private val QualityCtes =
    s"""base AS (
       |  SELECT doc_id, source, text, $Norm AS t,
       |    CASE WHEN LENGTH($Norm) = 0 THEN 0
       |         ELSE len(string_split($Norm, ' ')) END AS wc
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, source,
       |    ROUND(least(LENGTH(text) / 200.0, 1.0) * 0.4 +
       |      least((CASE WHEN wc = 0 THEN 0.0
       |        ELSE len(regexp_extract_all(t, '\\b(the|a|an|and|of|to|in|is|it|that|for|on|as|with|was|at|by|be)\\b')) * 1.0 / wc END) * 5.0, 1.0) * 0.3 +
       |      greatest(1.0 - (CASE WHEN LENGTH(text) = 0 THEN 0.0
       |        ELSE len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]-]')) * 1.0 / LENGTH(text) END) * 5.0, 0.0) * 0.3, 6) AS quality
       |  FROM base)""".stripMargin

  /** DuckDB dot-product text between two embedding-carrying aliases —
    * the shared arithmetic of the ANN oracles. */
  private def dotSql(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, len($a.embedding)+1),
       |      i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))""".stripMargin

  /** x79 oracle: replay all k greedy MMR picks (relevance − max cosine to
    * the selected set, rounded-6, id tie-break) as a generated CTE chain. */
  private def mmrSql(queryId: Long, k: Int): String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH n AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    sqrt(${dotSql("embeddings", "embeddings")}) AS nrm
         |  FROM embeddings),
         |q AS (SELECT embedding, nrm FROM n WHERE vec_id = $queryId),
         |r AS MATERIALIZED (
         |  SELECT c.vec_id, c.embedding, c.nrm,
         |    ROUND(${dotSql("q", "c")} / (q.nrm * c.nrm), 6) AS rel
         |  FROM n c, q WHERE c.vec_id <> $queryId),
         |s1 AS MATERIALIZED (
         |  SELECT vec_id, embedding, nrm, rel, CAST(0 AS DOUBLE) AS pen, rel AS score
         |  FROM r ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    for (j <- 2 to k) {
      val selUnion = (1 until j).map(i =>
        s"SELECT vec_id, embedding, nrm FROM s$i").mkString(" UNION ALL ")
      val selIds = (1 until j).map(i =>
        s"SELECT vec_id FROM s$i").mkString(" UNION ALL ")
      sb ++= s""",
         |s$j AS MATERIALIZED (
         |  SELECT c.vec_id, c.embedding, c.nrm, c.rel, p.pen, c.rel - p.pen AS score
         |  FROM r c JOIN (
         |      SELECT c2.vec_id, max(ROUND(${dotSql("c2", "s")} / (c2.nrm * s.nrm), 6)) AS pen
         |      FROM r c2, ($selUnion) s
         |      GROUP BY c2.vec_id) p ON c.vec_id = p.vec_id
         |  WHERE c.vec_id NOT IN ($selIds)
         |  ORDER BY score DESC, c.vec_id LIMIT 1)""".stripMargin
    }
    val rows = (1 to k).map(j =>
      s"SELECT CAST($j AS INT) AS rank, vec_id, rel AS relevance, pen AS penalty, score FROM s$j")
      .mkString("\n  UNION ALL ")
    sb ++= s"""
         |SELECT * FROM (
         |  $rows
         |) ORDER BY rank""".stripMargin
    sb.toString
  }

  /** Single-pass segment-dedup oracle — shared by x58 (one shot) and x64
    * (incremental index), whose results must be identical. */
  private lazy val SegmentDedupSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split($Norm, ' '), w -> length(w) > 0) AS toks
       |  FROM documents),
       |t2 AS (SELECT doc_id, toks, len(toks) AS len FROM toks WHERE len(toks) > 0),
       |segs AS (
       |  SELECT doc_id, CAST(u.seg_id AS BIGINT) AS seg_id,
       |    CAST(CEIL(len / 4.0) AS BIGINT) AS n_segs,
       |    array_to_string(toks[(u.seg_id*4+1):(u.seg_id*4+4)], ' ') AS seg_text
       |  FROM t2, UNNEST(range(0, CAST(CEIL(len / 4.0) AS BIGINT))) AS u(seg_id)),
       |flagged AS (
       |  SELECT doc_id, seg_id, n_segs, seg_text,
       |    ROW_NUMBER() OVER (PARTITION BY seg_text ORDER BY doc_id, seg_id) = 1
       |      AS kept
       |  FROM segs)
       |SELECT doc_id, MAX(n_segs) AS n_segs,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_segs,
       |  COALESCE(string_agg(CASE WHEN kept THEN seg_text END, ' ' ORDER BY seg_id),
       |    '') AS kept_text
       |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Shingle/size/intersection CTEs over a source CTE exposing (doc, t). */
  private def shingleCtes(src: String): String =
    s"""w AS (SELECT doc, string_split(t, ' ') AS w FROM $src),
       |sh AS (SELECT DISTINCT doc, array_to_string(w[i:i+2], ' ') AS shingle
       |       FROM w, UNNEST(range(1, greatest(len(w)-2, 0)+1)) AS u(i)),
       |sizes AS (SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc),
       |inter AS (
       |  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_inter
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
       |  GROUP BY 1, 2)""".stripMargin

  private val ShingleCte =
    s"""norm AS (SELECT doc_id AS doc, $Norm AS t FROM documents),
       |${shingleCtes("norm")}""".stripMargin

  /** MinHash signatures → banded buckets → verified pairs (x3's exact
    * parameters) over the shingle CTEs, ending in `lsh_pairs`. */
  private def minhashTail: String = minhashTail(0.6)
  private def minhashTail(thr: Double): String =
    s"""sig AS (
       |  SELECT doc,
       |    ${(0 until 8).map(i => s"MIN(md5('graft$i|' || shingle)) AS mh_$i").mkString(", ")}
       |  FROM sh GROUP BY doc),
       |buckets AS (
       |  ${(0 until 4).map(b =>
            s"SELECT doc, $b AS band, mh_${b * 2} || '|' || mh_${b * 2 + 1} AS key FROM sig")
            .mkString("\n  UNION ALL\n  ")}),
       |cand AS (
       |  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
       |  FROM buckets a JOIN buckets b
       |    ON a.band = b.band AND a.key = b.key AND a.doc < b.doc),
       |lsh_pairs AS (
       |  SELECT c.doc_a AS doc_a, c.doc_b AS doc_b,
       |    ROUND(COALESCE(n_inter, 0) * 1.0 / (sa.n_sh + sb.n_sh - COALESCE(n_inter, 0)), 6) AS jaccard
       |  FROM cand c
       |  LEFT JOIN inter ON c.doc_a = inter.doc_a AND c.doc_b = inter.doc_b
       |  JOIN sizes sa ON c.doc_a = sa.doc JOIN sizes sb ON c.doc_b = sb.doc
       |  WHERE COALESCE(n_inter, 0) * 1.0 / (sa.n_sh + sb.n_sh - COALESCE(n_inter, 0)) >= $thr)""".stripMargin

  private val MinhashCtes =
    s"""$ShingleCte,
       |$minhashTail""".stripMargin

  /** [[MinhashCtes]] with NO jaccard gate — every band-bucket candidate
    * survives with its verified jaccard (the x117 sweep's input). */
  private val MinhashAllCtes =
    s"""$ShingleCte,
       |${minhashTail(0.0)}""".stripMargin

  /** Shared by x107 (one-shot) and x109 (incremental) — identical
    * required results: lowest-cap-by-hash is associative, so the
    * incremental union of per-batch minima must converge to the one-shot
    * quota bit-for-bit. */
  val SourceCapSql: String =
    """WITH h AS (
      |  SELECT doc_id, source,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hash60
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source, hash60,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hash60, doc_id) AS rk
      |  FROM h)
      |SELECT doc_id, source, hash60 FROM r WHERE rk <= 15 ORDER BY doc_id""".stripMargin

  /** Shared by x102 (incremental batch) and x108 (stream) — identical
    * required results: the stream's exactly-once at-arrival compare of
    * the final commit must equal the batch replay of the same cut. */
  val DriftSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, u.term FROM (
       |    SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents) d,
       |    UNNEST(d.ws) AS u(term)
       |  WHERE len(u.term) > 0),
       |bd AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
       |cut AS (SELECT lo + (2 * (hi - lo)) // 3 AS c2 FROM bd),
       |prof AS (SELECT term, COUNT(*) AS c FROM tok, cut
       |         WHERE doc_id <= c2 GROUP BY term),
       |b3 AS (SELECT term, COUNT(*) AS c FROM tok, cut
       |       WHERE doc_id > c2 GROUP BY term),
       |pt AS (SELECT CAST(SUM(c) AS BIGINT) AS ptot FROM prof),
       |bt AS (SELECT CAST(SUM(c) AS BIGINT) AS btot FROM b3),
       |j AS (SELECT COALESCE(p.term, q.term) AS term,
       |    CAST(COALESCE(p.c, 0) AS BIGINT) AS c_profile,
       |    CAST(COALESCE(q.c, 0) AS BIGINT) AS c_batch
       |  FROM prof p FULL OUTER JOIN b3 q ON p.term = q.term),
       |x AS (SELECT term, c_profile, c_batch,
       |    CAST((c_profile * 1000000) // ptot AS BIGINT) AS p_profile_micro,
       |    CAST((c_batch * 1000000) // btot AS BIGINT) AS p_batch_micro
       |  FROM j, pt, bt)
       |SELECT term, c_profile, c_batch, p_profile_micro, p_batch_micro,
       |  abs(p_profile_micro - p_batch_micro) AS delta_micro
       |FROM x ORDER BY delta_micro DESC, term LIMIT 10""".stripMargin

  /** Shared by x87 (batch) and x90 (stream) — identical required
    * results: the stream's carried-state pair formation must aggregate
    * to exactly the batch window's. */
  val TransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS next_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events),
      |p AS (SELECT prev_type, next_type, COUNT(*) AS n FROM seq
      |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_from FROM p GROUP BY 1)
      |SELECT p.prev_type, p.next_type, p.n, t.n_from,
      |  CAST((p.n * 1000000) // t.n_from AS BIGINT) AS p_micro
      |FROM p JOIN tot t USING (prev_type)
      |ORDER BY prev_type, next_type""".stripMargin

  /** One k-core peeling round: edges eR-1 -> alive aR (deg >= 20) ->
    * edges eR (both endpoints alive) -> trace row rR. */
  private def kcoreRound(r: Int): String = {
    val p = r - 1
    s"""d$r AS (SELECT id, COUNT(*) AS deg FROM (
       |  SELECT lo AS id FROM e$p UNION ALL SELECT hi FROM e$p) GROUP BY id),
       |a$r AS (SELECT id FROM d$r WHERE deg >= 20),
       |e$r AS (SELECT lo, hi FROM e$p
       |  WHERE lo IN (SELECT id FROM a$r) AND hi IN (SELECT id FROM a$r)),
       |r$r AS (SELECT CAST($r AS BIGINT) AS round,
       |  (SELECT COUNT(*) FROM a$r) AS n_nodes,
       |  (SELECT COUNT(*) FROM e$r) AS n_edges)""".stripMargin
  }

  /** 60-bit md5-prefix word hash — [[graft.operators.Dedup.shingleHash]]'s
    * SQL twin, applied to a word expression. */
  private def wordHash(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  /** One PageRank round over the x92 co-occurrence graph (damping 17/20,
    * micro-units) — mirrors the engine's Graph.pageRank arithmetic. */
  private def trRound(prev: String, next: String): String =
    s"""s_$next AS (
       |  SELECT e.dst AS id, SUM($prev.pr // deg.outdeg) AS s
       |  FROM e JOIN deg USING (src) JOIN $prev ON $prev.id = e.src
       |  GROUP BY e.dst),
       |$next AS (
       |  SELECT n.id, CAST(150000 + (17 * COALESCE(s_$next.s, 0)) // 20 AS BIGINT) AS pr
       |  FROM nodes n LEFT JOIN s_$next ON s_$next.id = n.id)""".stripMargin

  /** One label-propagation round: votes from the labeled set lP, per-node
    * majority (count desc, label asc), newly adopted appended as lR. */
  private def lpRound(r: Int): String = {
    val p = r - 1
    s"""v$r AS (
       |  SELECT sym.s AS id, l$p.label, COUNT(*) AS c
       |  FROM sym JOIN l$p ON sym.d = l$p.id
       |  WHERE sym.s NOT IN (SELECT id FROM l$p)
       |  GROUP BY 1, 2),
       |n$r AS (SELECT id, label FROM (
       |  SELECT id, label,
       |    ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, label) AS rn
       |  FROM v$r) WHERE rn = 1),
       |l$r AS (SELECT * FROM l$p
       |  UNION ALL SELECT id, label, CAST($r AS BIGINT) FROM n$r)""".stripMargin
  }

  /** One water-filling redistribution round for the x95 oracle. */
  private def wfRound(r: Int): String = {
    val p = r - 1
    s"""s$p AS (
       |  SELECT CAST(SUM(alloc) AS BIGINT) AS allocated,
       |    CAST(COALESCE(SUM(CASE WHEN alloc < avail THEN share_micro END), 0)
       |      AS BIGINT) AS rem_share
       |  FROM r$p),
       |r$r AS (
       |  SELECT grp, avail, share_micro, budget,
       |    CASE WHEN alloc = avail THEN alloc
       |         ELSE LEAST(avail, alloc + CASE WHEN rem_share = 0 THEN 0
       |           ELSE ((budget - allocated) * share_micro) // rem_share END)
       |    END AS alloc
       |  FROM r$p, s$p)""".stripMargin
  }

  /** Shared by x88 (batch) and x98 (stream) — identical required
    * results: the stream's carried-window path emission must aggregate to
    * exactly the batch window's trigram counts. */
  val TopPathsSql: String =
    """WITH seq AS (
      |  SELECT event_type,
      |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l2,
      |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l1
      |  FROM events),
      |p AS (SELECT l2 || ' > ' || l1 || ' > ' || event_type AS path, COUNT(*) AS n
      |      FROM seq WHERE l2 IS NOT NULL GROUP BY 1)
      |SELECT path, n,
      |  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS INT) AS rk
      |FROM p ORDER BY n DESC, path LIMIT 10""".stripMargin

  /** Language-score columns for a half-string SQL expression — the x8
    * heuristic's SQL twin, prefixed so two halves coexist in one SELECT. */
  private def langScoreCols(src: String, p: String): String =
    s"    len(regexp_extract_all($src, '[\\x{4e00}-\\x{9fff}]')) AS ${p}_zh,\n" +
      graft.functions.TextFunctions.LangWords.map { case (lang, ws) =>
        s"    len(list_filter(string_split_regex(lower($src), '[^\\p{L}]+'), " +
          s"x -> x IN (${ws.map(w => s"'$w'").mkString(", ")}))) AS ${p}_$lang"
      }.mkString(",\n")

  /** The x8 decision CASE over `p`-prefixed score columns. */
  private def langCase(p: String): String =
    s"""CASE WHEN ${p}_zh > 0 THEN 'zh'
       |       WHEN ${p}_en >= ${p}_es AND ${p}_en >= ${p}_de AND ${p}_en >= ${p}_fr AND ${p}_en > 0 THEN 'en'
       |       WHEN ${p}_es >= ${p}_de AND ${p}_es >= ${p}_fr AND ${p}_es > 0 THEN 'es'
       |       WHEN ${p}_de >= ${p}_fr AND ${p}_de > 0 THEN 'de'
       |       WHEN ${p}_fr > 0 THEN 'fr'
       |       ELSE 'und' END""".stripMargin

  /** x21's deterministic sign-bit LSH bucket in DuckDB (same components). */
  private def annBucketSql(alias: String): String =
    Similarity.lshComponents(4, 64).zipWithIndex.map { case (comp, b) =>
      s"CASE WHEN $alias.embedding[${comp + 1}] >= 0 THEN ${1L << b} ELSE 0 END"
    }.mkString("(", " + ", ")")

  private val AnnDot =
    """list_sum(list_transform(range(1, len(q.embedding)+1),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))""".stripMargin

  /** Shared by x114 (one-shot) and x118 (incremental) — identical
    * required results: the incremental store tables must converge to the
    * one-shot datasheet bit-for-bit. */
  /** x119's DuckDB replay — shared with x122, whose batch-merged
    * accumulator must converge to the one-shot report bit-for-bit. */
  private val ContaminationReportSql: String =
    s"""WITH c AS (SELECT doc_id AS doc, source, $Norm AS t FROM documents WHERE doc_id % 13 <> 0),
       |b AS (SELECT lang AS bench, $Norm AS t FROM documents WHERE doc_id % 13 = 0),
       |cw AS (SELECT doc, source, string_split(t, ' ') AS w FROM c),
       |csh AS (SELECT DISTINCT doc, source, array_to_string(w[i:i+2], ' ') AS shingle
       |        FROM cw, UNNEST(range(1, greatest(len(w)-2, 0)+1)) AS u(i)),
       |bw AS (SELECT bench, string_split(t, ' ') AS w FROM b),
       |bsh AS (SELECT DISTINCT bench, array_to_string(w[i:i+2], ' ') AS shingle
       |        FROM bw, UNNEST(range(1, greatest(len(w)-2, 0)+1)) AS u(i)),
       |ov AS (SELECT cs.doc, cs.source, bs.bench, COUNT(*) AS o
       |       FROM csh cs JOIN bsh bs USING (shingle) GROUP BY 1, 2, 3),
       |hits AS (SELECT bench, source, SUM(o) AS overlap_ngrams,
       |           SUM(CASE WHEN o >= 3 THEN 1 ELSE 0 END) AS n_contaminated
       |         FROM ov GROUP BY 1, 2),
       |tot AS (SELECT source, COUNT(*) AS n_docs FROM documents WHERE doc_id % 13 <> 0 GROUP BY 1),
       |bl AS (SELECT DISTINCT bench FROM b)
       |SELECT bl.bench AS benchmark, tot.source, tot.n_docs,
       |  CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       |  CAST((1000000 * COALESCE(h.n_contaminated, 0)) // tot.n_docs AS BIGINT) AS contaminated_micro,
       |  CAST(COALESCE(h.overlap_ngrams, 0) AS BIGINT) AS overlap_ngrams
       |FROM bl CROSS JOIN tot
       |LEFT JOIN hits h ON h.bench = bl.bench AND h.source = tot.source
       |ORDER BY 1, 2""".stripMargin

  private val DatasheetSql: String =
      s"""WITH $QualityCtes,
         |st AS (
         |  SELECT b.source, COUNT(*) AS n_docs,
         |    CAST(SUM(len(list_filter(string_split(b.t, ' '), w -> length(w) > 0))) AS BIGINT) AS n_tokens,
         |    CAST(SUM(LENGTH(b.text)) AS BIGINT) AS n_chars,
         |    CAST(SUM(CAST(ROUND(q.quality * 1000000) AS BIGINT)) AS BIGINT)
         |      // COUNT(*) AS mean_quality_micro
         |  FROM base b JOIN q ON b.doc_id = q.doc_id GROUP BY 1),
         |lm AS (SELECT source, lang, COUNT(*) AS lc FROM documents GROUP BY 1, 2),
         |top AS (
         |  SELECT source, lang AS top_lang, lc,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY lc DESC, lang) AS rn,
         |    SUM(lc) OVER (PARTITION BY source) AS nd
         |  FROM lm),
         |th AS (SELECT source,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
         |  FROM documents),
         |hf AS (SELECT h, COUNT(*) AS df FROM th GROUP BY 1),
         |dup AS (
         |  SELECT th.source, COUNT(*) AS dup_docs
         |  FROM th JOIN hf ON th.h = hf.h WHERE hf.df >= 2 GROUP BY 1)
         |SELECT st.source, st.n_docs, st.n_tokens, st.n_chars,
         |  st.mean_quality_micro, top.top_lang,
         |  CAST(top.lc * 1000000 // top.nd AS BIGINT) AS top_lang_share_micro,
         |  CAST(COALESCE(dup.dup_docs, 0) AS BIGINT) AS dup_docs,
         |  CAST(COALESCE(dup.dup_docs, 0) * 1000000 // st.n_docs AS BIGINT) AS dup_rate_micro
         |FROM st JOIN top ON st.source = top.source AND top.rn = 1
         |LEFT JOIN dup ON st.source = dup.source
         |ORDER BY st.source""".stripMargin

  val oracles: Map[String, String] = Map(
    "x117_threshold_sweep" ->
      s"""WITH $MinhashAllCtes,
         |rungs AS (SELECT CAST(thr AS BIGINT) AS thr_micro FROM (VALUES
         |  (500000), (600000), (700000), (800000), (900000)) AS t(thr)),
         |pm AS (SELECT CAST(ROUND(jaccard * 1000000) AS BIGINT) AS jm,
         |  doc_a, doc_b FROM lsh_pairs),
         |kept AS (SELECT thr_micro, jm, doc_a, doc_b
         |  FROM rungs JOIN pm ON jm >= thr_micro),
         |agg AS (SELECT thr_micro, COUNT(*) AS n_pairs,
         |  CAST(SUM(jm) AS BIGINT) AS jaccard_mass_micro FROM kept GROUP BY 1),
         |docs_in AS (SELECT thr_micro, COUNT(*) AS nd FROM (
         |  SELECT DISTINCT thr_micro, u.d FROM kept, UNNEST([doc_a, doc_b]) AS u(d))
         |  GROUP BY 1)
         |SELECT r.thr_micro,
         |  CAST(COALESCE(a.n_pairs, 0) AS BIGINT) AS n_pairs,
         |  CAST(COALESCE(a.jaccard_mass_micro, 0) AS BIGINT) AS jaccard_mass_micro,
         |  CAST(COALESCE(d.nd, 0) AS BIGINT) AS n_docs_involved
         |FROM rungs r LEFT JOIN agg a ON r.thr_micro = a.thr_micro
         |LEFT JOIN docs_in d ON r.thr_micro = d.thr_micro
         |ORDER BY r.thr_micro""".stripMargin,
    "x115_ann_recall" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
         |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
         |  FROM embeddings),
         |b AS (SELECT vec_id, embedding, nrm, ${annBucketSql("n")} AS bucket FROM n),
         |exr AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ROUND($AnnDot / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rk
         |  FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |ex AS (SELECT query_id, neighbor_id FROM exr WHERE rk <= 5),
         |apr AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ROUND($AnnDot / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rk
         |  FROM b q JOIN b c ON q.bucket = c.bucket
         |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |ap AS (SELECT query_id, neighbor_id FROM apr WHERE rk <= 5),
         |h AS (SELECT ex.query_id, COUNT(*) AS hits
         |  FROM ex JOIN ap USING (query_id, neighbor_id) GROUP BY 1)
         |SELECT e.query_id, e.n_exact,
         |  CAST(COALESCE(a.n_lsh, 0) AS BIGINT) AS n_lsh,
         |  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
         |  CAST(COALESCE(h.hits, 0) * 1000000 // e.n_exact AS BIGINT) AS recall_micro
         |FROM (SELECT query_id, COUNT(*) AS n_exact FROM ex GROUP BY 1) e
         |LEFT JOIN (SELECT query_id, COUNT(*) AS n_lsh FROM ap GROUP BY 1) a
         |  ON e.query_id = a.query_id
         |LEFT JOIN h ON e.query_id = h.query_id
         |ORDER BY e.query_id""".stripMargin,
    "x118_incremental_datasheet" -> DatasheetSql,
    "x114_source_datasheet" -> DatasheetSql,
    "x110_pii_scan" ->
      """WITH aug AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END
        |    || CASE WHEN doc_id % 6 = 0 THEN ' or admin' || CAST(doc_id AS VARCHAR) || '@test.org' ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0 THEN ' cc Ops.Team' || CAST(doc_id AS VARCHAR) || '@Example.COM' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 up' ELSE '' END
        |    || CASE WHEN doc_id % 9 = 0 THEN ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0 THEN ' card 4' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |    || CASE WHEN doc_id % 17 = 0 THEN ' pan 37' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0') ELSE '' END
        |    || CASE WHEN doc_id % 23 = 0 THEN ' amex 37' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0') || '-' || lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0') ELSE '' END
        |    || CASE WHEN doc_id % 19 = 0 THEN ' iban DE' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || 'BANK' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0') || 'X end' ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(t, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS BIGINT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(t, '\d{3}-\d{2}-\d{4}')) AS BIGINT) AS n_ssn,
        |  CAST(len(regexp_extract_all(t, '\d{4}([- ]?\d{4}){2}[- ]?\d{1,7}|\d{4}[- ]?\d{6}[- ]?\d{5}')) AS BIGINT) AS n_cc,
        |  CAST(len(regexp_extract_all(t, '[A-Z]{2}\d{2}[A-Z0-9]{11,30}')) AS BIGINT) AS n_iban,
        |  CAST(len(regexp_extract_all(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
        |    + len(regexp_extract_all(t, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}'))
        |    + len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}'))
        |    + len(regexp_extract_all(t, '\d{3}-\d{2}-\d{4}'))
        |    + len(regexp_extract_all(t, '\d{4}([- ]?\d{4}){2}[- ]?\d{1,7}|\d{4}[- ]?\d{6}[- ]?\d{5}'))
        |    + len(regexp_extract_all(t, '[A-Z]{2}\d{2}[A-Z0-9]{11,30}')) AS BIGINT) AS n_pii,
        |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
        |    '[A-Z]{2}\d{2}[A-Z0-9]{11,30}', '[IBAN]', 'g'),
        |    '\d{4}([- ]?\d{4}){2}[- ]?\d{1,7}|\d{4}[- ]?\d{6}[- ]?\d{5}', '[CC]', 'g'),
        |    '\d{3}-\d{2}-\d{4}', '[SSN]', 'g'),
        |    '\d{3}-\d{3}-\d{4}', '[PHONE]', 'g'),
        |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '[IP]', 'g')) AS redacted_md5
        |FROM aug ORDER BY doc_id""".stripMargin,
    "x111_source_overlap" ->
      s"""WITH $MinhashCtes,
         |sp AS (SELECT doc_id, source FROM documents)
         |SELECT least(a.source, b.source) AS source_lo,
         |  greatest(a.source, b.source) AS source_hi,
         |  COUNT(*) AS n_pairs,
         |  CAST(SUM(CAST(ROUND(jaccard * 1000000) AS BIGINT)) AS BIGINT) AS jaccard_mass_micro
         |FROM lsh_pairs p
         |JOIN sp a ON p.doc_a = a.doc_id
         |JOIN sp b ON p.doc_b = b.doc_id
         |WHERE a.source <> b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x112_memorization_risk" ->
      s"""WITH norm AS (SELECT doc_id AS doc, $Norm AS t FROM documents),
         |w AS (SELECT doc, string_split(t, ' ') AS w FROM norm),
         |sh AS (SELECT DISTINCT doc,
         |    CAST(('0x' || substring(md5(array_to_string(w[i:i+4], ' ')), 1, 15)) AS BIGINT) AS shh
         |  FROM w, UNNEST(range(1, greatest(len(w)-4, 0)+1)) AS u(i)),
         |df AS (SELECT shh, COUNT(*) AS df FROM sh GROUP BY 1)
         |SELECT doc AS doc_id, COUNT(*) AS n_sh,
         |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |  CAST(MAX(df) AS BIGINT) AS max_df,
         |  (CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000) // COUNT(*) AS risk_micro
         |FROM sh JOIN df USING (shh)
         |GROUP BY doc ORDER BY doc""".stripMargin,
    "x113_curriculum_order" ->
      s"""WITH $QualityCtes,
         |k AS (
         |  SELECT doc_id,
         |    least(CAST(ROUND(quality * 1000000) AS BIGINT) // 125000, 7) AS qb,
         |    CAST(('0x' || substring(md5('curr|' || CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS h52
         |  FROM q)
         |SELECT doc_id, qb, ROW_NUMBER() OVER (ORDER BY qb, h52, doc_id) AS pos
         |FROM k ORDER BY doc_id""".stripMargin,
    "x109_incremental_quota" -> SourceCapSql,
    "x107_source_cap" -> SourceCapSql,
    "x106_best_of_cluster" ->
      s"""WITH RECURSIVE $MinhashCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM lsh_pairs
         |  UNION SELECT doc_b, doc_a FROM lsh_pairs),
         |reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |cl AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
         |$QualityCtes,
         |scored AS (
         |  SELECT cl.cluster_id, q.doc_id,
         |    CAST(ROUND(q.quality * 1000000) AS BIGINT) AS qm,
         |    ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
         |      ORDER BY CAST(ROUND(q.quality * 1000000) AS BIGINT) DESC, q.doc_id) AS rk,
         |    COUNT(*) OVER (PARTITION BY cl.cluster_id) AS n_docs
         |  FROM cl JOIN q USING (doc_id))
         |SELECT cluster_id, CAST(n_docs AS BIGINT) AS n_docs,
         |  doc_id AS rep_doc, qm AS rep_quality_micro
         |FROM scored WHERE rk = 1 ORDER BY cluster_id""".stripMargin,
    "x105_epoch_plan" ->
      s"""WITH $QualityCtes,
         |agg AS (
         |  SELECT q.source, COUNT(*) AS n_docs, CAST(SUM(b.wc) AS BIGINT) AS tokens,
         |    SUM(CAST(ROUND(q.quality * 1000000) AS BIGINT)) // COUNT(*) AS quality_micro
         |  FROM q JOIN base b USING (doc_id) GROUP BY q.source),
         |tot AS (SELECT 2 * SUM(tokens) AS budget FROM agg),
         |plan AS (
         |  SELECT a.source, a.n_docs, a.tokens, a.quality_micro, t.budget,
         |    COALESCE(SUM(3 * a.tokens) OVER (ORDER BY a.quality_micro DESC, a.source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |  FROM agg a, tot t)
         |SELECT source, n_docs, tokens, CAST(quality_micro AS BIGINT) AS quality_micro,
         |  CAST(GREATEST(0, LEAST(3 * tokens, budget - before)) AS BIGINT) AS alloc_tokens,
         |  CAST(CASE WHEN tokens = 0 THEN 0
         |    ELSE (GREATEST(0, LEAST(3 * tokens, budget - before)) * 1000000) // tokens END
         |    AS BIGINT) AS epochs_micro
         |FROM plan ORDER BY source""".stripMargin,
    "x104_salted_join" ->
      """SELECT p.p_brand, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin,
    "x103_skew_report" ->
      """WITH c AS (SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
        |s AS (SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS total_rows,
        |    ROUND(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
        |    ROUND(quantile_cont(cnt, 0.99), 6) AS p99_cnt
        |  FROM c),
        |top AS (
        |  SELECT l_orderkey AS key, cnt,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, l_orderkey) AS rk
        |  FROM c ORDER BY cnt DESC, l_orderkey LIMIT 10)
        |SELECT CAST(rk AS INT) AS rk, key, cnt,
        |  CAST((cnt * 1000000) // total_rows AS BIGINT) AS share_micro,
        |  n_keys, total_rows, p50_cnt, p99_cnt
        |FROM top, s ORDER BY rk""".stripMargin,
    "x108_drift_stream" -> DriftSql,
    "x102_incremental_drift" -> DriftSql,
    "x101_quality_percentile" ->
      s"""WITH $QualityCtes,
         |r AS (
         |  SELECT doc_id, source, quality,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality, doc_id) AS rk,
         |    COUNT(*) OVER (PARTITION BY source) AS n
         |  FROM q)
         |SELECT doc_id, source, quality,
         |  CAST(CASE WHEN n = 1 THEN 1000000
         |       ELSE ((rk - 1) * 1000000) // (n - 1) END AS BIGINT) AS pct_micro
         |FROM r ORDER BY doc_id""".stripMargin,
    "x100_dedup_audit" ->
      s"""WITH $MinhashCtes,
         |shadow AS (
         |  SELECT a.doc AS dropped_doc, MIN(b.doc) AS shadowed_by
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.key = b.key AND b.doc < a.doc
         |  GROUP BY 1)
         |SELECT s.dropped_doc, s.shadowed_by,
         |  CAST((1000000 * COALESCE(i.n_inter, 0))
         |    // (sa.n_sh + sb.n_sh - COALESCE(i.n_inter, 0)) AS BIGINT)
         |    AS jaccard_micro
         |FROM shadow s
         |JOIN sizes sa ON sa.doc = s.shadowed_by
         |JOIN sizes sb ON sb.doc = s.dropped_doc
         |LEFT JOIN inter i
         |  ON i.doc_a = s.shadowed_by AND i.doc_b = s.dropped_doc
         |ORDER BY s.dropped_doc""".stripMargin,
    "x99_mixed_lang" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    list_filter(string_split($Norm, ' '), w -> len(w) > 0) AS ws
         |  FROM documents),
         |h AS (
         |  SELECT doc_id, lang,
         |    array_to_string(ws[1:len(ws) // 2], ' ') AS head_txt,
         |    array_to_string(ws[len(ws) // 2 + 1:len(ws)], ' ') AS tail_txt
         |  FROM d WHERE len(ws) >= 4),
         |scored AS (
         |  SELECT doc_id, lang,
         |${langScoreCols("head_txt", "h")},
         |${langScoreCols("tail_txt", "t")}
         |  FROM h),
         |langs AS (
         |  SELECT doc_id, lang,
         |    ${langCase("h")} AS head_lang,
         |    ${langCase("t")} AS tail_lang
         |  FROM scored)
         |SELECT doc_id, lang, head_lang, tail_lang,
         |  head_lang <> tail_lang AS mixed
         |FROM langs ORDER BY doc_id""".stripMargin,
    "x97_fuzzy_lookup" ->
      """WITH l AS (SELECT doc_id AS id, substr(text, 1, 60) AS k
        |           FROM documents WHERE doc_id % 2 = 1),
        |r AS (SELECT doc_id AS id, substr(text, 1, 60) AS k
        |      FROM documents WHERE doc_id % 2 = 0),
        |lb AS (SELECT id, k, substr(k, 1, 8) AS blk FROM l
        |       UNION ALL
        |       SELECT id, k, substr(k, greatest(length(k) - 7, 1)) FROM l),
        |rb AS (SELECT id, k, substr(k, 1, 8) AS blk FROM r
        |       UNION ALL
        |       SELECT id, k, substr(k, greatest(length(k) - 7, 1)) FROM r),
        |cand AS (
        |  SELECT DISTINCT lb.id AS l_id, rb.id AS r_id, lb.k AS lk, rb.k AS rk2
        |  FROM lb JOIN rb ON lb.blk = rb.blk
        |   AND abs(length(lb.k) - length(rb.k)) <= 8),
        |scored AS (
        |  SELECT l_id, r_id, levenshtein(lk, rk2) AS dist FROM cand
        |  WHERE levenshtein(lk, rk2) <= 8),
        |best AS (
        |  SELECT l_id, r_id, dist,
        |    ROW_NUMBER() OVER (PARTITION BY l_id ORDER BY dist, r_id) AS rn
        |  FROM scored)
        |SELECT l_id AS doc_id, r_id AS ref_id, dist FROM best WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "x95_water_fill" ->
      s"""WITH avail AS (
         |  SELECT lang AS grp,
         |    CAST(SUM(len(list_filter(string_split(text, ' '), w -> len(w) > 0)))
         |      AS BIGINT) AS avail
         |  FROM documents GROUP BY 1),
         |tgt(grp, share_micro) AS (VALUES
         |  ${MixTargets.map { case (g, m) => s"('$g', CAST($m AS BIGINT))" }
                .mkString(", ")}),
         |base AS (SELECT a.grp, a.avail, t.share_micro
         |         FROM avail a JOIN tgt t USING (grp)),
         |b AS (SELECT CAST((SUM(avail) * 3) // 5 AS BIGINT) AS budget FROM base),
         |r1 AS (
         |  SELECT grp, avail, share_micro, budget,
         |    LEAST(avail, (budget * share_micro) // 1000000) AS alloc
         |  FROM base, b),
         |${wfRound(2)},
         |${wfRound(3)}
         |SELECT grp AS lang, avail, share_micro, budget,
         |  CAST(alloc AS BIGINT) AS alloc, alloc = avail AS exhausted
         |FROM r3 ORDER BY lang""".stripMargin,
    "x96_cluster_weights" ->
      s"""WITH RECURSIVE $MinhashCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM lsh_pairs
         |  UNION SELECT doc_b, doc_a FROM lsh_pairs),
         |reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |cl AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
         |       FROM reach GROUP BY src),
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csize
         |       FROM cl GROUP BY 1)
         |SELECT cl.doc_id, cl.cluster_id, sz.csize,
         |  CAST(1000000 // csize AS BIGINT) AS weight_micro
         |FROM cl JOIN sz USING (cluster_id) ORDER BY doc_id""".stripMargin,
    "x94_drift" ->
      s"""WITH tok AS (
         |  SELECT doc_id % 2 = 0 AS side_a, u.term
         |  FROM (SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents) d,
         |       UNNEST(d.ws) AS u(term)
         |  WHERE len(u.term) > 0),
         |ca AS (SELECT term, COUNT(*) AS c FROM tok WHERE side_a GROUP BY 1),
         |cb AS (SELECT term, COUNT(*) AS c FROM tok WHERE NOT side_a GROUP BY 1),
         |ta AS (SELECT CAST(SUM(c) AS BIGINT) AS tot_a FROM ca),
         |tb AS (SELECT CAST(SUM(c) AS BIGINT) AS tot_b FROM cb),
         |j AS (
         |  SELECT COALESCE(ca.term, cb.term) AS term,
         |    CAST(COALESCE(ca.c, 0) AS BIGINT) AS c_a,
         |    CAST(COALESCE(cb.c, 0) AS BIGINT) AS c_b
         |  FROM ca FULL OUTER JOIN cb ON ca.term = cb.term),
         |p AS (
         |  SELECT term, c_a, c_b,
         |    CAST((c_a * 1000000) // tot_a AS BIGINT) AS p_a_micro,
         |    CAST((c_b * 1000000) // tot_b AS BIGINT) AS p_b_micro
         |  FROM j, ta, tb)
         |SELECT term, c_a, c_b, p_a_micro, p_b_micro,
         |  abs(p_a_micro - p_b_micro) AS delta_micro
         |FROM p ORDER BY delta_micro DESC, term LIMIT 20""".stripMargin,
    "x92_textrank" ->
      s"""WITH d AS (SELECT string_split($Norm, ' ') AS ws FROM documents),
         |pr_pairs AS (
         |  SELECT ws[i] AS wa, ws[i + o] AS wb
         |  FROM d, UNNEST([1, 2]) AS o_(o),
         |       UNNEST(range(1, len(ws) + 1 - o)) AS i_(i)
         |  WHERE len(ws[i]) > 0 AND len(ws[i + o]) > 0 AND ws[i] <> ws[i + o]),
         |und AS (SELECT DISTINCT least(wa, wb) AS a, greatest(wa, wb) AS b
         |        FROM pr_pairs),
         |e AS (SELECT DISTINCT src, dst FROM (
         |  SELECT ${wordHash("a")} AS src, ${wordHash("b")} AS dst FROM und
         |  UNION ALL
         |  SELECT ${wordHash("b")}, ${wordHash("a")} FROM und)),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
         |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
         |${trRound("r0", "r1")},
         |${trRound("r1", "r2")},
         |${trRound("r2", "r3")},
         |dict AS (SELECT DISTINCT a AS word FROM und
         |         UNION SELECT b FROM und)
         |SELECT word, pr,
         |  CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, word) AS INT) AS rk
         |FROM r3 JOIN dict ON r3.id = ${wordHash("word")}
         |ORDER BY pr DESC, word LIMIT 20""".stripMargin,
    "x93_label_prop" ->
      s"""WITH $MinhashCtes,
         |sym AS (SELECT doc_a AS s, doc_b AS d FROM lsh_pairs
         |        UNION ALL SELECT doc_b, doc_a FROM lsh_pairs),
         |l0 AS (SELECT doc_id AS id, lang AS label, CAST(0 AS BIGINT) AS round
         |       FROM documents WHERE doc_id % 5 = 0),
         |${lpRound(1)},
         |${lpRound(2)}
         |SELECT id AS doc_id, label, round FROM l2 ORDER BY doc_id""".stripMargin,
    "x88_top_paths" -> TopPathsSql,
    "x89_kcore" ->
      s"""WITH e0 AS (
         |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS lo,
         |                  greatest(a.l_partkey, b.l_partkey) AS hi
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
         |  WHERE a.l_orderkey % 7 = 0),
         |${kcoreRound(1)},
         |${kcoreRound(2)},
         |${kcoreRound(3)},
         |${kcoreRound(4)}
         |SELECT round, n_nodes, n_edges FROM r1
         |UNION ALL SELECT round, n_nodes, n_edges FROM r2
         |UNION ALL SELECT round, n_nodes, n_edges FROM r3
         |UNION ALL SELECT round, n_nodes, n_edges FROM r4
         |ORDER BY round""".stripMargin,
    "x84_fuzzy_join" ->
      """WITH d AS (SELECT doc_id AS id, substr(text, 1, 60) AS k FROM documents),
        |blk AS (
        |  SELECT id, k, substr(k, 1, 8) AS blk FROM d
        |  UNION ALL
        |  SELECT id, k, substr(k, greatest(length(k) - 7, 1)) AS blk FROM d),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.k AS ka, b.k AS kb
        |  FROM blk a JOIN blk b
        |    ON a.blk = b.blk AND a.id < b.id
        |   AND abs(length(a.k) - length(b.k)) <= 8)
        |SELECT id_a, id_b, levenshtein(ka, kb) AS dist FROM cand
        |WHERE levenshtein(ka, kb) <= 8
        |ORDER BY id_a, id_b""".stripMargin,
    "x85_triangles" ->
      """WITH und AS (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS lo,
        |                  greatest(a.l_partkey, b.l_partkey) AS hi
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |  WHERE a.l_orderkey % 7 = 0),
        |deg AS (SELECT id, COUNT(*) AS deg FROM (
        |  SELECT lo AS id FROM und UNION ALL SELECT hi FROM und) GROUP BY id),
        |o AS (
        |  SELECT CASE WHEN ord THEN lo ELSE hi END AS u,
        |         CASE WHEN ord THEN hi ELSE lo END AS v,
        |         CASE WHEN ord THEN dh ELSE dl END AS vdeg
        |  FROM (SELECT u.lo, u.hi, dl.deg AS dl, dh.deg AS dh,
        |          (dl.deg < dh.deg OR (dl.deg = dh.deg AND u.lo < u.hi)) AS ord
        |        FROM und u JOIN deg dl ON dl.id = u.lo
        |                   JOIN deg dh ON dh.id = u.hi)),
        |wp AS (
        |  SELECT a.v AS wu, b.v AS wv FROM o a JOIN o b
        |    ON a.u = b.u AND (a.vdeg < b.vdeg OR (a.vdeg = b.vdeg AND a.v < b.v))),
        |tri AS (
        |  SELECT COUNT(*) AS n_triangles FROM wp
        |  WHERE EXISTS (SELECT 1 FROM o WHERE o.u = wp.wu AND o.v = wp.wv)),
        |stats AS (
        |  SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
        |         (SELECT COUNT(*) FROM und) AS n_edges,
        |         (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  CAST((3 * n_triangles * 1000000) // n_wedges AS BIGINT) AS gcc_micro
        |FROM stats, tri""".stripMargin,
    "x86_length_buckets" ->
      """WITH d AS (SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), w -> len(w) > 0)) AS n_tokens
        |  FROM documents),
        |r AS (SELECT doc_id, n_tokens,
        |    CASE WHEN n_tokens <= 32 THEN 32 WHEN n_tokens <= 64 THEN 64
        |         WHEN n_tokens <= 128 THEN 128 WHEN n_tokens <= 256 THEN 256
        |         ELSE 512 END AS rung
        |  FROM d),
        |a AS (SELECT CAST(rung AS BIGINT) AS rung, COUNT(*) AS n_docs,
        |    CAST(SUM(LEAST(n_tokens, rung)) AS BIGINT) AS sum_tokens
        |  FROM r GROUP BY rung),
        |b AS (SELECT rung, n_docs, sum_tokens,
        |    CAST((n_docs + 7) // 8 AS BIGINT) AS n_batches,
        |    CAST(((n_docs + 7) // 8) * 8 * rung AS BIGINT) AS padded_slots
        |  FROM a)
        |SELECT rung, n_docs, sum_tokens, n_batches, padded_slots,
        |  CAST(((padded_slots - sum_tokens) * 1000) // padded_slots AS BIGINT)
        |    AS waste_permille
        |FROM b ORDER BY rung""".stripMargin,
    "x87_transitions" -> TransitionsSql,
    "x74_span_corruption" ->
      s"""WITH d AS (SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents),
         |toks AS (SELECT doc_id, u.i - 1 AS pos, ws[u.i] AS term
         |         FROM d, UNNEST(range(1, len(ws) + 1)) AS u(i)
         |         WHERE len(ws[u.i]) > 0),
         |flags AS (SELECT doc_id, pos, term,
         |    CAST(('0x' || substring(md5('mask|' || CAST(doc_id AS VARCHAR) || '|' || CAST(pos AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 15 AS masked
         |  FROM toks),
         |seg AS (SELECT doc_id, pos, term, masked,
         |    masked AND NOT COALESCE(LAG(masked) OVER (PARTITION BY doc_id ORDER BY pos), FALSE) AS seg_start
         |  FROM flags),
         |sp AS (SELECT doc_id, pos, term, masked, seg_start,
         |    CAST(SUM(CASE WHEN seg_start THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS span_idx
         |  FROM seg),
         |pieces AS (SELECT doc_id, pos, masked, span_idx,
         |    CASE WHEN NOT masked THEN term
         |         WHEN seg_start THEN '<extra_id_' || CAST(span_idx - 1 AS VARCHAR) || '>' END AS ip,
         |    CASE WHEN masked AND seg_start THEN '<extra_id_' || CAST(span_idx - 1 AS VARCHAR) || '> ' || term
         |         WHEN masked THEN term END AS tp
         |  FROM sp)
         |SELECT doc_id,
         |  CAST(COALESCE(MAX(CASE WHEN masked THEN span_idx END), 0) AS BIGINT) AS n_spans,
         |  COALESCE(string_agg(ip, ' ' ORDER BY pos), '') AS input_text,
         |  COALESCE(string_agg(tp, ' ' ORDER BY pos), '') AS target_text
         |FROM pieces GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x69_pmi_bigrams" ->
      s"""WITH d AS (SELECT string_split($Norm, ' ') AS ws FROM documents),
         |toks AS (SELECT u.term FROM d, UNNEST(d.ws) AS u(term) WHERE len(u.term) > 0),
         |uni AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY 1),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM uni),
         |bg AS (SELECT ws[u.i] AS w1, ws[u.i + 1] AS w2
         |       FROM d, UNNEST(range(1, len(ws))) AS u(i)
         |       WHERE len(ws[u.i]) > 0 AND len(ws[u.i + 1]) > 0),
         |cxy AS (SELECT w1, w2, COUNT(*) AS c_xy FROM bg GROUP BY 1, 2
         |        HAVING COUNT(*) >= 5)
         |SELECT c.w1, c.w2, c.c_xy, x.c AS c_x, y.c AS c_y,
         |  (c.c_xy * t.n_tokens * 1000000) // (x.c * y.c) AS lift_micro
         |FROM cxy c JOIN uni x ON c.w1 = x.term JOIN uni y ON c.w2 = y.term, tot t
         |ORDER BY lift_micro DESC, c_xy DESC, w1, w2 LIMIT 20""".stripMargin,
    "x70_inverted_index" ->
      s"""WITH words AS (
         |  SELECT doc_id, u.term FROM (
         |    SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents) d,
         |    UNNEST(d.ws) AS u(term)
         |  WHERE len(u.term) > 0),
         |tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM words GROUP BY 1, 2)
         |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
         |  string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
         |             ',' ORDER BY doc_id) AS postings
         |FROM tf GROUP BY term
         |HAVING COUNT(*) BETWEEN 5 AND 1000000
         |ORDER BY term""".stripMargin,
    "x71_weighted_sample" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
        |    CAST(('0x' || substring(md5('wps|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, weight, (h * 1000000) // weight AS priority
        |FROM b ORDER BY priority, doc_id LIMIT 50""".stripMargin,
    "x65_hard_negatives" ->
      """WITH n AS (
        |  SELECT vec_id, label, embedding,
        |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS anchor_id, c.vec_id AS neg_id, c.label AS neg_label,
        |    ROUND(list_sum(list_transform(range(1, len(q.embedding)+1),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
        |      / (q.nrm * c.nrm), 6) AS cos_sim
        |  FROM n q JOIN n c ON q.vec_id % 25 = 0
        |    AND c.label IS DISTINCT FROM q.label),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY cos_sim DESC, neg_id) AS rk
        |  FROM scored)
        |SELECT anchor_id, neg_id, neg_label, cos_sim, rk FROM ranked WHERE rk <= 5
        |ORDER BY anchor_id, rk""".stripMargin,
    "x66_leakage_split" ->
      s"""WITH RECURSIVE $MinhashCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM lsh_pairs
         |  UNION SELECT doc_b, doc_a FROM lsh_pairs),
         |reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |cl AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
         |b AS (
         |  SELECT doc_id, cluster_id,
         |    CAST(('0x' || substring(md5('cl|' || CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
         |  FROM cl)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,
    "x67_token_budget" ->
      s"""WITH b AS (
         |  SELECT doc_id, source,
         |    CAST(CASE WHEN LENGTH($Norm) = 0 THEN 0
         |              ELSE len(string_split($Norm, ' ')) END AS BIGINT) AS n_tokens,
         |    md5('prio|' || CAST(doc_id AS VARCHAR)) AS prio
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY prio, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         |  FROM b)
         |SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
         |FROM c WHERE cum_tokens <= 800 ORDER BY source, cum_tokens""".stripMargin,
    "x43_negative_sampling" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (ORDER BY md5('neg|' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS pos
        |  FROM documents),
        |n AS (SELECT COUNT(*) AS c FROM r),
        |p AS (
        |  SELECT r.doc_id, r.lang, r.pos, u.j, (r.pos + u.j * 7) % n.c AS cand
        |  FROM r CROSS JOIN n, UNNEST(range(1, 5)) AS u(j))
        |SELECT p.doc_id, CAST(p.j AS BIGINT) AS j, q.doc_id AS neg_doc_id,
        |  p.lang <> q.lang AS cross_lang
        |FROM p JOIN r q ON q.pos = p.cand
        |ORDER BY p.doc_id, p.j""".stripMargin,
    "x42_incremental_medallion" ->
      """WITH b1 AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 10 < 8),
        |b2 AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
        |  FROM customer WHERE c_custkey % 10 < 9 AND c_custkey % 17 <> 0)
        |SELECT * FROM (
        |  -- unchanged current rows from load 1
        |  SELECT b1.c_custkey, b1.c_name, b1.c_acctbal,
        |    TIMESTAMP '2024-01-01 00:00:00' AS _tf_valid_from,
        |    CAST(NULL AS TIMESTAMP) AS _tf_valid_to
        |  FROM b1 JOIN b2 ON b1.c_custkey = b2.c_custkey
        |  WHERE b1.c_name = b2.c_name AND b1.c_acctbal = b2.c_acctbal
        |  UNION ALL
        |  -- closed: changed in load 2
        |  SELECT b1.c_custkey, b1.c_name, b1.c_acctbal,
        |    TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00'
        |  FROM b1 JOIN b2 ON b1.c_custkey = b2.c_custkey
        |  WHERE b1.c_name <> b2.c_name OR b1.c_acctbal <> b2.c_acctbal
        |  UNION ALL
        |  -- closed: vanished from load 2 (a load is a full snapshot)
        |  SELECT b1.c_custkey, b1.c_name, b1.c_acctbal,
        |    TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00'
        |  FROM b1 WHERE NOT EXISTS (SELECT 1 FROM b2 WHERE b2.c_custkey = b1.c_custkey)
        |  UNION ALL
        |  -- new current versions for changed keys
        |  SELECT b2.c_custkey, b2.c_name, b2.c_acctbal,
        |    TIMESTAMP '2024-02-01 00:00:00', CAST(NULL AS TIMESTAMP)
        |  FROM b1 JOIN b2 ON b1.c_custkey = b2.c_custkey
        |  WHERE b1.c_name <> b2.c_name OR b1.c_acctbal <> b2.c_acctbal
        |  UNION ALL
        |  -- inserted keys (in the increment only)
        |  SELECT b2.c_custkey, b2.c_name, b2.c_acctbal,
        |    TIMESTAMP '2024-02-01 00:00:00', CAST(NULL AS TIMESTAMP)
        |  FROM b2 WHERE NOT EXISTS (SELECT 1 FROM b1 WHERE b1.c_custkey = b2.c_custkey))
        |ORDER BY c_custkey, _tf_valid_from""".stripMargin,
    "x40_chunking" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    list_filter(string_split($Norm, ' '), t -> len(t) > 0) AS toks
         |  FROM documents),
         |sized AS (
         |  SELECT doc_id, toks, len(toks) AS len,
         |    CAST(CEIL(GREATEST(len(toks) - 64, 0) / 48.0) + 1 AS BIGINT) AS n_chunks
         |  FROM d WHERE len(toks) > 0)
         |SELECT doc_id, u.chunk_id,
         |  CAST(u.chunk_id * 48 AS BIGINT) AS start,
         |  array_to_string(toks[CAST(u.chunk_id * 48 + 1 AS BIGINT):CAST(u.chunk_id * 48 + 64 AS BIGINT)], ' ') AS chunk_text,
         |  LEAST(len - u.chunk_id * 48, 64) AS chunk_len
         |FROM sized, UNNEST(range(0, n_chunks)) AS u(chunk_id)
         |ORDER BY doc_id, chunk_id""".stripMargin,
    "x41_mixture" ->
      """WITH w AS (
        |  SELECT doc_id, lang,
        |    CASE lang WHEN 'en' THEN 2 WHEN 'fr' THEN 0 ELSE 1 END
        |      + CASE WHEN CAST(('0x' || substring(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
        |               < CASE lang WHEN 'en' THEN 50 WHEN 'fr' THEN 50 ELSE 0 END
        |             THEN 1 ELSE 0 END AS n_copies
        |  FROM documents)
        |SELECT doc_id, lang, CAST(n_copies AS BIGINT) AS n_copies,
        |  CAST(u.copy_id AS BIGINT) AS copy_id
        |FROM w, UNNEST(range(1, n_copies + 1)) AS u(copy_id)
        |WHERE n_copies > 0
        |ORDER BY doc_id, copy_id""".stripMargin,
    "x38_countmin" ->
      s"""WITH words AS (
         |  SELECT u.term FROM (
         |    SELECT string_split($Norm, ' ') AS ws FROM documents) d,
         |    UNNEST(d.ws) AS u(term) WHERE len(u.term) > 0),
         |sk AS (
         |  SELECT dd.depth, CAST(('0x' || substring(md5('cms' || dd.depth || '|' || term), 1, 8)) AS BIGINT) % 64 AS bucket,
         |    COUNT(*) AS c
         |  FROM words CROSS JOIN (VALUES (0), (1), (2)) dd(depth)
         |  GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT u.term FROM (
         |    SELECT string_split($Norm, ' ') AS ws FROM documents WHERE doc_id % 17 = 0) d,
         |    UNNEST(d.ws) AS u(term) WHERE len(u.term) > 0),
         |est AS (
         |  SELECT cand.term, CAST(MIN(sk.c) AS BIGINT) AS est_count
         |  FROM cand CROSS JOIN (VALUES (0), (1), (2)) dd(depth)
         |  JOIN sk ON sk.depth = dd.depth AND sk.bucket =
         |    CAST(('0x' || substring(md5('cms' || dd.depth || '|' || cand.term), 1, 8)) AS BIGINT) % 64
         |  GROUP BY cand.term),
         |truth AS (SELECT term, COUNT(*) AS true_count FROM words GROUP BY 1)
         |SELECT est.term, est_count, true_count
         |FROM est JOIN truth ON est.term = truth.term
         |ORDER BY est_count DESC, est.term LIMIT 15""".stripMargin,
    "x39_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS day_value
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, UNNEST(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY))::DATE AS day
        |  FROM daily GROUP BY user_id)
        |SELECT s.user_id, s.day,
        |  last_value(d.day_value IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  d.day_value IS NULL AS gap_filled
        |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
        |ORDER BY s.user_id, s.day""".stripMargin,
    "x34_bm25_topk" -> {
      val qvals = Bm25Queries
        .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }.mkString(", ")
      // the score expression mirrors the Spark side operation-for-operation:
      // every op is IEEE double +,*,/ over integer-valued inputs (engine-
      // identical), the idf is the log-free rational form, and the final
      // per-term contribution is floored to BIGINT micro-units so the SUM
      // is exact and order-independent.
      s"""WITH toks AS (
         |  SELECT doc_id, u.term FROM (
         |    SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents) d,
         |    UNNEST(d.ws) AS u(term)
         |  WHERE len(u.term) > 0),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |lens AS (SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY 1),
         |stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len) AS BIGINT) AS total_tokens FROM lens),
         |q AS (SELECT * FROM (VALUES $qvals) AS t(query_id, term)),
         |dfreq AS (SELECT term, COUNT(*) AS dfreq FROM tf
         |          WHERE term IN (SELECT term FROM q) GROUP BY 1),
         |scored AS (
         |  SELECT q.query_id, tf.doc_id,
         |    CAST(SUM(CAST(FLOOR(
         |      (((2.0 * s.n_docs - 2.0 * d.dfreq + 1.0) / (2.0 * d.dfreq + 1.0)) *
         |       ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 +
         |         0.75 * (CAST(l.len * s.n_docs AS DOUBLE) / CAST(s.total_tokens AS DOUBLE))))))
         |      * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro,
         |    COUNT(*) AS n_hit_terms
         |  FROM tf JOIN q USING (term) JOIN dfreq d USING (term)
         |       JOIN lens l ON tf.doc_id = l.doc_id CROSS JOIN stats s
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY score_micro DESC, doc_id) AS rk FROM scored)
         |SELECT query_id, doc_id, score_micro, n_hit_terms, rk
         |FROM ranked WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
    },
    "x35_seq_packing" ->
      """WITH sized AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens,
        |    CAST(FLOOR(doc_id / 100) AS BIGINT) AS bucket
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id, n_tokens, bucket,
        |    SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
        |  FROM sized)
        |SELECT doc_id, n_tokens, bucket,
        |  CAST(FLOOR((e - n_tokens) / 512) AS BIGINT) AS pack,
        |  CAST((e - n_tokens) % 512 AS BIGINT) AS pack_offset,
        |  CASE WHEN n_tokens = 0 THEN 0
        |       ELSE CAST(FLOOR((e - 1) / 512) AS BIGINT)
        |          - CAST(FLOOR((e - n_tokens) / 512) AS BIGINT) + 1 END AS n_packs
        |FROM cum ORDER BY doc_id""".stripMargin,
    "x33_table_stream" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "x9_fingerprint" ->
      s"""WITH n AS (SELECT doc_id, $Norm AS t FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    list_reduce(
         |      list_prepend(CAST(0 AS HUGEINT),
         |        list_transform(regexp_extract_all(t, '.'), c -> CAST(unicode(c) AS HUGEINT))),
         |      (acc, c) -> (acc * 1000003 + c) % 18446744073709551616) AS h
         |  FROM n)
         |SELECT doc_id,
         |  CAST(CASE WHEN h >= 9223372036854775808 THEN h - 18446744073709551616 ELSE h END AS BIGINT) AS fingerprint
         |FROM f ORDER BY doc_id""".stripMargin,
    "x10_media_features" ->
      """WITH h AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    list_transform(range(0, 16),
        |      i -> CAST(('0x' || substring(md5(text), 2*i+1, 2)) AS INT)) AS px
        |  FROM documents)
        |SELECT media_id, media_type,
        |  CASE WHEN media_type = 'image' THEN 4 WHEN media_type = 'video' THEN 2 END AS width,
        |  CASE WHEN media_type = 'image' THEN 4 WHEN media_type = 'video' THEN 2 END AS height,
        |  CASE WHEN media_type IN ('image', 'audio') THEN 1 WHEN media_type = 'video' THEN 3 END AS channels,
        |  CASE WHEN media_type = 'audio' THEN 8000 END AS sample_rate,
        |  CASE WHEN media_type = 'audio' THEN 16 WHEN media_type = 'video' THEN 4 END AS n_frames,
        |  ROUND(CASE WHEN media_type = 'audio'
        |        THEN list_sum(list_transform(px, v -> (v - 128) * 256)) / 16.0
        |        ELSE list_sum(px) / 16.0 END, 6) AS px_mean,
        |  CAST(CASE WHEN media_type = 'audio'
        |       THEN list_max(list_transform(px, v -> (v - 128) * 256))
        |       ELSE list_max(px) END AS INT) AS px_max
        |FROM h ORDER BY media_id""".stripMargin,
    "x26_curation" ->
      s"""WITH RECURSIVE
         |base AS (
         |  SELECT doc_id, text, $Norm AS t,
         |    CASE WHEN LENGTH($Norm) = 0 THEN 0
         |         ELSE len(string_split($Norm, ' ')) END AS wc
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, t,
         |    ROUND(least(LENGTH(text) / 200.0, 1.0) * 0.4 +
         |          least(CASE WHEN wc = 0 THEN 0.0
         |                ELSE len(regexp_extract_all(t, '\\b(the|a|an|and|of|to|in|is|it|that|for|on|as|with|was|at|by|be)\\b')) * 1.0 / wc END * 5.0, 1.0) * 0.3 +
         |          greatest(1.0 - CASE WHEN LENGTH(text) = 0 THEN 0.0
         |                ELSE len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]-]')) * 1.0 / LENGTH(text) END * 5.0, 0.0) * 0.3, 6) AS quality
         |  FROM base),
         |qual AS (SELECT doc_id, t, quality FROM scored WHERE quality >= 0.5),
         |exact AS (
         |  SELECT doc_id AS doc, t, quality FROM (
         |    SELECT doc_id, t, quality,
         |      ROW_NUMBER() OVER (PARTITION BY md5(t) ORDER BY doc_id) AS rn
         |    FROM qual) WHERE rn = 1),
         |${shingleCtes("exact")},
         |$minhashTail,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM lsh_pairs
         |  UNION SELECT doc_b, doc_a FROM lsh_pairs),
         |reach(src, dst) AS (
         |  SELECT doc, doc FROM exact
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |clusters AS (SELECT src AS doc, MIN(dst) AS cluster FROM reach GROUP BY src)
         |SELECT e.doc AS doc_id, e.quality, CASE
         |    WHEN CAST(('0x' || substring(md5(CAST(e.doc AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
         |    WHEN CAST(('0x' || substring(md5(CAST(e.doc AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
         |    ELSE 'test' END AS split
         |FROM exact e JOIN clusters c ON e.doc = c.doc AND c.doc = c.cluster
         |ORDER BY doc_id""".stripMargin,
    "x23_text_clean" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{7,}', '<NUM>', 'g') AS clean_text,
        |  len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_urls,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text, '[0-9]{7,}')) AS n_longnums
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x44_gopher_rep" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |bg AS (
        |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
        |  FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) r),
        |tg AS (
        |  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        |  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) r),
        |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
        |tgc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2),
        |bga AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bg,
        |  CAST(max(c) AS BIGINT) AS top_bg,
        |  CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_bg
        |  FROM bgc GROUP BY 1),
        |tga AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tg,
        |  CAST(max(c) AS BIGINT) AS top_tg,
        |  CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_tg
        |  FROM tgc GROUP BY 1)
        |SELECT b.doc_id, n_bg, top_bg, dup_bg, n_tg, top_tg, dup_tg,
        |  CAST(top_bg * 5 <= n_bg AND top_tg * 50 <= n_tg * 9
        |       AND dup_bg * 5 <= n_bg AS INT) AS keep
        |FROM bga b JOIN tga t ON b.doc_id = t.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "x24_repetition" ->
      s"""WITH tok AS (
         |  SELECT doc_id, tok
         |  FROM (SELECT doc_id, $Norm AS t FROM documents), UNNEST(string_split(t, ' ')) AS u(tok)
         |  WHERE LENGTH(tok) > 0),
         |wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok)
         |SELECT doc_id,
         |  CAST(SUM(c) AS BIGINT) AS n_words,
         |  COUNT(*) AS n_distinct,
         |  ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS rep_ratio,
         |  ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS top_word_frac
         |FROM wc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x20_dataset_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket,
        |    md5('shuffle|' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |    shuffle_key
        |  FROM b)
        |SELECT doc_id, split, shuffle_key,
        |  ROW_NUMBER() OVER (PARTITION BY split ORDER BY shuffle_key) AS shuffle_pos
        |FROM s ORDER BY split, shuffle_pos""".stripMargin,
    // shared by the incremental twin: x122 must converge to x119
    // bit-for-bit under the frozen benchmark suite
    "x122_incremental_contamination" -> ContaminationReportSql,
    "x119_contamination_report" -> ContaminationReportSql,
    "x30_decontaminate" ->
      s"""WITH c AS (SELECT doc_id AS doc, $Norm AS t FROM documents WHERE doc_id % 13 <> 0),
         |b AS (SELECT doc_id AS doc, $Norm AS t FROM documents WHERE doc_id % 13 = 0),
         |cw AS (SELECT doc, string_split(t, ' ') AS w FROM c),
         |csh AS (SELECT DISTINCT doc, array_to_string(w[i:i+2], ' ') AS shingle
         |        FROM cw, UNNEST(range(1, greatest(len(w)-2, 0)+1)) AS u(i)),
         |bw AS (SELECT doc, string_split(t, ' ') AS w FROM b),
         |bsh AS (SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS shingle
         |        FROM bw, UNNEST(range(1, greatest(len(w)-2, 0)+1)) AS u(i)),
         |hits AS (SELECT doc, COUNT(*) AS n_overlap FROM csh
         |         WHERE shingle IN (SELECT shingle FROM bsh) GROUP BY doc)
         |SELECT c.doc AS doc_id,
         |  CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
         |  COALESCE(h.n_overlap, 0) >= 3 AS contaminated
         |FROM c LEFT JOIN hits h ON c.doc = h.doc
         |ORDER BY doc_id""".stripMargin,
    "x31_stratified_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5('strat|' || lang || '|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM b
        |WHERE bucket < CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 50 WHEN 'fr' THEN 80 ELSE 100 END
        |ORDER BY doc_id""".stripMargin,
    "x32_top_terms" ->
      s"""WITH words AS (
         |  SELECT doc_id, u.term FROM (
         |    SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents) d,
         |    UNNEST(d.ws) AS u(term)
         |  WHERE len(u.term) > 0),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS n_docs FROM tf GROUP BY 1),
         |ranked AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.n_docs,
         |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
         |      ORDER BY tf.tf DESC, dfreq.n_docs ASC, tf.term ASC) AS rank
         |  FROM tf JOIN dfreq USING (term))
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, n_docs
         |FROM ranked WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin,
    "x1_dedup_exact" ->
      s"""SELECT md5($Norm) AS text_md5, MIN(doc_id) AS canonical_id, COUNT(*) AS n_dups
         |FROM documents GROUP BY 1 ORDER BY text_md5""".stripMargin,
    "x2_ngram_jaccard" ->
      s"""WITH $ShingleCte
         |SELECT doc_a, doc_b,
         |  ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
         |FROM inter JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
         |WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,
    "x3_minhash_lsh" ->
      s"""WITH $MinhashCtes
         |SELECT doc_a, doc_b, jaccard FROM lsh_pairs
         |ORDER BY doc_a, doc_b""".stripMargin,
    "x22_dup_clusters" ->
      s"""WITH RECURSIVE $MinhashCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM lsh_pairs
         |  UNION SELECT doc_b, doc_a FROM lsh_pairs),
         |reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
         |SELECT src AS doc_id, MIN(dst) AS cluster_id
         |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,
    "x28_firstseen_dedup" ->
      s"""WITH $MinhashCtes
         |SELECT d.doc_id, d.lang FROM documents d
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.key = b.key AND b.doc < a.doc
         |  WHERE a.doc = d.doc_id)
         |ORDER BY doc_id""".stripMargin,
    "x50_quality_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, w FROM (
        |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |    FROM documents) WHERE length(w) > 0),
        |dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY w),
        |scored AS (
        |  SELECT t.doc_id, t.lang,
        |    CAST((1000000 * SUM(d.df)) // COUNT(*) AS BIGINT) AS score_micro
        |  FROM tok t JOIN dfreq d USING (w) GROUP BY t.doc_id, t.lang)
        |SELECT doc_id, lang, score_micro,
        |  CAST(NTILE(3) OVER (PARTITION BY lang
        |    ORDER BY score_micro DESC, doc_id) AS BIGINT) AS bucket
        |FROM scored ORDER BY doc_id""".stripMargin,
    "x51_bigram_fluency" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
         |  FROM documents),
         |t2 AS (SELECT * FROM toks WHERE len(ws) >= 2),
         |big AS (
         |  SELECT doc_id, source, ws[i] AS w1, ws[i + 1] AS w2
         |  FROM t2, UNNEST(range(1, len(ws))) AS u(i)),
         |c12 AS (
         |  SELECT w1, w2, COUNT(*) AS c12 FROM big
         |  WHERE source IN ($RefSliceSql) GROUP BY 1, 2),
         |c1 AS (SELECT w1, SUM(c12) AS c1 FROM c12 GROUP BY 1),
         |v AS (
         |  SELECT COUNT(DISTINCT w) AS v FROM (
         |    SELECT unnest(ws) AS w FROM t2 WHERE source IN ($RefSliceSql))),
         |p AS (
         |  SELECT b.doc_id,
         |    (1000000 * (COALESCE(c12.c12, 0) + 1))
         |      // (COALESCE(c1.c1, 0) + v.v) AS p_micro
         |  FROM big b
         |  LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
         |  LEFT JOIN c1 ON b.w1 = c1.w1
         |  CROSS JOIN v)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  CAST(SUM(p_micro) // COUNT(*) AS BIGINT) AS fluency_micro
         |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x52_dsir_select" ->
      s"""WITH tok AS (
         |  SELECT doc_id, source, w FROM (
         |    SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
         |    FROM documents) WHERE length(w) > 0),
         |h AS (
         |  SELECT doc_id, source,
         |    CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) % 256 AS b
         |  FROM tok),
         |ct AS (
         |  SELECT b, COUNT(*) AS ct FROM h
         |  WHERE source IN ($RefSliceSql) GROUP BY 1),
         |cq AS (SELECT b, COUNT(*) AS cq FROM h GROUP BY 1),
         |tot AS (
         |  SELECT
         |    COUNT(*) FILTER (WHERE source IN ($RefSliceSql)) AS nt,
         |    COUNT(*) AS nq
         |  FROM h),
         |r AS (
         |  SELECT cq.b,
         |    CAST((CAST(1000000 AS HUGEINT) * (COALESCE(ct.ct, 0) + 1) * (tot.nq + 256))
         |      // ((cq.cq + 1) * (tot.nt + 256)) AS BIGINT) AS r_micro
         |  FROM cq LEFT JOIN ct ON cq.b = ct.b CROSS JOIN tot),
         |scored AS (
         |  SELECT h.doc_id, COUNT(*) AS n_tokens,
         |    CAST(SUM(CAST(r.r_micro AS HUGEINT)) // COUNT(*) AS BIGINT) AS dsir_micro
         |  FROM h JOIN r ON h.b = r.b GROUP BY h.doc_id),
         |thr AS (
         |  SELECT CAST(SUM(CAST(dsir_micro AS HUGEINT)) // COUNT(*) AS BIGINT) AS thr
         |  FROM scored)
         |SELECT doc_id, n_tokens, dsir_micro,
         |  CAST(dsir_micro > thr AS INT) AS selected
         |FROM scored CROSS JOIN thr ORDER BY doc_id""".stripMargin,
    "x56_shard_layout" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split($Norm, ' '), w -> length(w) > 0))
         |      AS BIGINT) AS n_tok,
         |    md5('shuf|' || CAST(doc_id AS VARCHAR)) AS key
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, n_tok, key,
         |    CAST(CAST(('0x' || substring(key, 1, 8)) AS BIGINT) % 8 AS INT) AS shard
         |  FROM d)
         |SELECT doc_id, shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY key, doc_id) - 1
         |    AS BIGINT) AS pos,
         |  n_tok,
         |  CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY key, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS tok_offset
         |FROM sh ORDER BY shard, pos""".stripMargin,
    "x63_quarantine_replay" ->
      """WITH v AS (
        |  SELECT doc_id, lang, n_chars,
        |    lang NOT IN ('en','de','fr') AS kl,
        |    n_chars > 500 AS sd
        |  FROM documents
        |  WHERE lang NOT IN ('en','de','fr') OR n_chars > 400)
        |SELECT doc_id, lang, n_chars,
        |  CASE WHEN kl AND sd THEN 'known_lang,short_doc'
        |       WHEN kl THEN 'known_lang' ELSE 'short_doc' END AS violations
        |FROM v WHERE kl OR sd ORDER BY doc_id""".stripMargin,
    "x62_streaming_quality" ->
      """WITH r AS (SELECT (MIN(doc_id)+MAX(doc_id))//2 AS cut FROM documents),
        |v AS (
        |  SELECT doc_id, lang, n_chars,
        |    lang NOT IN ('en','de','fr') AS kl,
        |    n_chars > 400 AS sd,
        |    CASE WHEN doc_id <= (SELECT cut FROM r) THEN 0 ELSE 1 END AS b
        |  FROM documents)
        |SELECT doc_id, lang, n_chars,
        |  CASE WHEN kl AND sd THEN 'known_lang,short_doc'
        |       WHEN kl THEN 'known_lang' ELSE 'short_doc' END AS violations,
        |  CAST(b AS BIGINT) AS _batch_id
        |FROM v WHERE kl OR sd ORDER BY doc_id""".stripMargin,
    "x61_expectations" ->
      """WITH c AS (SELECT
        |  SUM(CASE WHEN doc_id IS NOT NULL THEN 1 ELSE 0 END) AS p_id,
        |  SUM(CASE WHEN lang IN ('en','de','fr') THEN 1 ELSE 0 END) AS p_lang,
        |  SUM(CASE WHEN length(text) > 0 THEN 1 ELSE 0 END) AS p_txt,
        |  SUM(CASE WHEN n_chars <= 400 THEN 1 ELSE 0 END) AS p_short,
        |  COUNT(*) AS n
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT 'has_id' AS expectation, 'fail' AS action,
        |    CAST(p_id AS BIGINT) AS n_pass, CAST(n - p_id AS BIGINT) AS n_fail FROM c
        |  UNION ALL SELECT 'known_lang', 'drop',
        |    CAST(p_lang AS BIGINT), CAST(n - p_lang AS BIGINT) FROM c
        |  UNION ALL SELECT 'nonempty_text', 'drop',
        |    CAST(p_txt AS BIGINT), CAST(n - p_txt AS BIGINT) FROM c
        |  UNION ALL SELECT 'short_doc', 'warn',
        |    CAST(p_short AS BIGINT), CAST(n - p_short AS BIGINT) FROM c)
        |ORDER BY expectation""".stripMargin,
    "x59_export_manifest" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split($Norm, ' '), w -> length(w) > 0))
         |      AS BIGINT) AS n_tok,
         |    md5('shuf|' || CAST(doc_id AS VARCHAR)) AS key
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, n_tok, key,
         |    CAST(CAST(('0x' || substring(key, 1, 8)) AS BIGINT) % 8 AS INT) AS shard
         |  FROM d),
         |layout AS (
         |  SELECT doc_id, shard, n_tok,
         |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY key, doc_id) AS pos
         |  FROM sh)
         |SELECT shard, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY pos)) AS ids_md5
         |FROM layout GROUP BY shard ORDER BY shard""".stripMargin,
    "x57_embed_decontam" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |s AS (
        |  SELECT c.vec_id,
        |    MAX(ROUND(list_sum(list_transform(range(1, len(c.embedding)+1),
        |      i -> CAST(c.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |      / (c.nrm * b.nrm), 6)) AS max_cos
        |  FROM n c JOIN n b ON c.vec_id % 25 <> 0 AND b.vec_id % 25 = 0
        |  GROUP BY c.vec_id)
        |SELECT vec_id, max_cos, max_cos >= 0.4499995 AS contaminated
        |FROM s ORDER BY vec_id""".stripMargin,
    "x58_segment_dedup" -> SegmentDedupSql,
    // for id-ordered batches the incremental index run must reproduce the
    // single pass verbatim — the oracle IS x58's SQL
    "x64_incremental_segments" -> SegmentDedupSql,
    "x55_incremental_profile" ->
      """WITH d AS (
        |  SELECT source,
        |    len(list_filter(string_split(text, ' '), w -> length(w) > 0)) AS n_tok,
        |    n_chars
        |  FROM documents WHERE doc_id % 97 <> 0)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "x54_corpus_profile" ->
      s"""WITH d AS (
         |  SELECT source, lang, n_chars,
         |    len(list_filter(string_split(text, ' '), w -> length(w) > 0)) AS n_tok,
         |    md5($Norm) AS h
         |  FROM documents),
         |dup AS (SELECT h FROM d GROUP BY h HAVING COUNT(*) > 1)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  COUNT(DISTINCT lang) AS n_langs,
         |  CAST(SUM(CASE WHEN h IN (SELECT h FROM dup) THEN 1 ELSE 0 END) AS BIGINT)
         |    AS dup_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "x53_token_ids" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[i] AS w
        |  FROM toks, UNNEST(range(1, len(ws) + 1)) AS u(i)),
        |cnt AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
        |vocab AS (
        |  SELECT w, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS INT) AS id
        |  FROM cnt ORDER BY cnt DESC, w LIMIT 512)
        |SELECT tok.doc_id, COUNT(*) AS n_tokens,
        |  string_agg(CAST(COALESCE(v.id, 0) AS VARCHAR), ' ' ORDER BY pos) AS ids
        |FROM tok LEFT JOIN vocab v ON tok.w = v.w
        |GROUP BY tok.doc_id ORDER BY doc_id""".stripMargin,
    "x49_span_dedup" ->
      s"""WITH norm AS (SELECT doc_id AS doc, $Norm AS t FROM documents),
         |w AS (SELECT doc, string_split(t, ' ') AS w FROM norm),
         |spans AS (
         |  SELECT doc, CAST(i AS INT) AS pos, array_to_string(w[i:i+14], ' ') AS span
         |  FROM w, UNNEST(range(1, greatest(len(w)-14, 0)+1)) AS u(i)),
         |dup AS (SELECT span FROM spans GROUP BY span HAVING COUNT(DISTINCT doc) > 1),
         |hits AS (SELECT doc, pos FROM spans WHERE span IN (SELECT span FROM dup)),
         |flag AS (
         |  SELECT doc, pos, pos + 14 AS e,
         |    MAX(pos + 14) OVER (PARTITION BY doc ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
         |  FROM hits),
         |isl AS (
         |  SELECT doc, pos, e,
         |    SUM(CASE WHEN pme IS NULL OR pos > pme + 1 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc ORDER BY pos) AS island
         |  FROM flag),
         |g AS (SELECT doc, island, MIN(pos) AS s, MAX(e) AS e FROM isl GROUP BY 1, 2)
         |SELECT doc AS doc_id, COUNT(*) AS n_dup_spans,
         |  CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
         |FROM g GROUP BY doc ORDER BY doc_id""".stripMargin,
    "x47_hybrid_retrieval" ->
      s"""WITH $ShingleCte,
         |qinter AS (
         |  SELECT q.doc AS query_id, c.doc AS doc_id, COUNT(*) AS n_inter
         |  FROM sh q JOIN sh c ON q.shingle = c.shingle
         |    AND q.doc < 5 AND c.doc <> q.doc
         |  GROUP BY 1, 2),
         |lex AS (
         |  SELECT query_id, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
         |      ROUND(n_inter * 1.0 / (sq.n_sh + sc.n_sh - n_inter), 6) DESC,
         |      doc_id) AS rk
         |  FROM qinter
         |  JOIN sizes sq ON query_id = sq.doc JOIN sizes sc ON doc_id = sc.doc),
         |nrm AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
         |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
         |  FROM embeddings),
         |semscore AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |    ROUND(list_sum(list_transform(range(1, len(q.embedding)+1),
         |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
         |      / (q.nrm * c.nrm), 6) AS cos_sim
         |  FROM nrm q JOIN nrm c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
         |sem AS (
         |  SELECT query_id, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, doc_id) AS rk
         |  FROM semscore),
         |fused AS (
         |  SELECT query_id, doc_id,
         |    CAST(SUM(1000000000000 // (60 + rk)) AS BIGINT) AS rrf_micro,
         |    COUNT(*) AS n_rankers
         |  FROM (SELECT query_id, doc_id, rk FROM lex WHERE rk <= 20
         |        UNION ALL
         |        SELECT query_id, doc_id, rk FROM sem WHERE rk <= 20)
         |  GROUP BY 1, 2)
         |SELECT query_id, doc_id, rrf_micro, n_rankers,
         |  ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY rrf_micro DESC, doc_id) AS rk
         |FROM fused
         |QUALIFY rk <= 10
         |ORDER BY query_id, rk""".stripMargin,
    // x46's contract IS x28: incremental batches + persisted index must
    // be indistinguishable from the single-pass run
    "x46_incremental_dedup" ->
      s"""WITH $MinhashCtes
         |SELECT d.doc_id, d.lang FROM documents d
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.key = b.key AND b.doc < a.doc
         |  WHERE a.doc = d.doc_id)
         |ORDER BY doc_id""".stripMargin,
    "x4_simhash_pairs" ->
      s"""WITH norm AS (SELECT doc_id AS doc, $Norm AS t FROM documents),
         |tok AS (
         |  SELECT DISTINCT doc, tok FROM norm, UNNEST(string_split(t, ' ')) AS u(tok)
         |  WHERE LENGTH(tok) > 0),
         |h AS (SELECT doc, CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) AS h FROM tok),
         |votes AS (
         |  SELECT doc, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM h, UNNEST(range(0, 32)) AS u(b) GROUP BY doc, b),
         |fp AS (
         |  SELECT doc, SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
         |  FROM votes GROUP BY doc)
         |SELECT a.doc AS doc_a, b.doc AS doc_b,
         |  bit_count(xor(a.simhash, b.simhash)) AS hamming
         |FROM fp a JOIN fp b ON a.doc < b.doc
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "x79_mmr_select" -> mmrSql(queryId = 0L, k = 8),
    "x83_incremental_novelty" ->
      """WITH bounds AS (
        |  SELECT CAST(min(doc_id) AS BIGINT) AS mn, CAST(max(doc_id) AS BIGINT) AS mx
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, text,
        |    CASE WHEN doc_id <= ((mn + mx) // 2) // 2 THEN 1
        |         WHEN doc_id <= (mn + mx) // 2 THEN 2 ELSE 3 END AS bat
        |  FROM documents, bounds),
        |toks AS (SELECT doc_id, bat,
        |  list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws FROM b),
        |sh AS (
        |  SELECT DISTINCT doc_id, bat,
        |    CAST(('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 15)) AS BIGINT) AS sh
        |  FROM (SELECT doc_id, bat, ws, unnest(range(1, len(ws) - 3)) AS i
        |        FROM toks WHERE len(ws) >= 5)),
        |sc AS (
        |  SELECT a.doc_id, a.sh,
        |         max(CASE WHEN o.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS shared
        |  FROM sh a LEFT JOIN sh o
        |    ON a.sh = o.sh AND o.doc_id <> a.doc_id AND o.bat <= a.bat
        |  GROUP BY a.doc_id, a.sh)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(shared) AS BIGINT) AS shared_shingles,
        |  CAST((1000000 * sum(shared)) // count(*) AS BIGINT) AS boilerplate_micro
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x81_shingle_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    CAST(('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 15)) AS BIGINT) AS sh
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 3)) AS i
        |        FROM toks WHERE len(ws) >= 5)),
        |df AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS shared_shingles,
        |  CAST((1000000 * sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
        |    AS boilerplate_micro
        |FROM sh JOIN df USING (sh) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x80_quality_outliers" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |meds AS (SELECT source, quantile_cont(n_chars, 0.5) AS med FROM d GROUP BY source),
        |dev AS (SELECT d.doc_id, d.source, d.n_chars, meds.med,
        |               abs(d.n_chars - meds.med) AS dev
        |        FROM d JOIN meds USING (source)),
        |mads AS (SELECT source, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY source)
        |SELECT doc_id, source, n_chars,
        |       ROUND(med, 6) AS med, ROUND(mad, 6) AS mad
        |FROM dev JOIN mads USING (source)
        |WHERE dev > 3.0 * mad
        |ORDER BY doc_id""".stripMargin,
    "x5_ann_topk" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ROUND(list_sum(list_transform(range(1, len(q.embedding)+1),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
        |      / (q.nrm * c.nrm), 6) AS cos_sim
        |  FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
        |  FROM scored)
        |SELECT query_id, neighbor_id, cos_sim, rk FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin,
    "x6_embed_neardup" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(list_sum(list_transform(range(1, len(a.embedding)+1),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |    / (a.nrm * b.nrm), 6) AS cos_sim
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(range(1, len(a.embedding)+1),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |    / (a.nrm * b.nrm) >= 0.4499995
        |ORDER BY id_a, id_b""".stripMargin,
    "x7_text_stats" ->
      s"""WITH base AS (
         |  SELECT doc_id, text, $Norm AS t,
         |    CASE WHEN LENGTH($Norm) = 0 THEN 0
         |         ELSE len(string_split($Norm, ' ')) END AS wc
         |  FROM documents),
         |stats AS (
         |  SELECT doc_id, wc AS word_count,
         |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS token_count,
         |    CASE WHEN LENGTH(text) = 0 THEN 0.0
         |         ELSE len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]-]')) * 1.0 / LENGTH(text) END AS pr,
         |    CASE WHEN wc = 0 THEN 0.0
         |         ELSE len(regexp_extract_all(t, '\\b(the|a|an|and|of|to|in|is|it|that|for|on|as|with|was|at|by|be)\\b')) * 1.0 / wc END AS sr,
         |    LENGTH(text) AS n_len
         |  FROM base)
         |SELECT doc_id, word_count, token_count,
         |  ROUND(pr, 6) AS punct_ratio, ROUND(sr, 6) AS stopword_ratio,
         |  ROUND(least(n_len / 200.0, 1.0) * 0.4 + least(sr * 5.0, 1.0) * 0.3 +
         |        greatest(1.0 - pr * 5.0, 0.0) * 0.3, 6) AS quality
         |FROM stats ORDER BY doc_id""".stripMargin,
    "x8_lang_id" ->
      s"""WITH d AS (
         |  SELECT lang AS labeled,
         |    string_split_regex(lower(text), '[^\\p{L}]+') AS toks, text FROM documents),
         |scores AS (
         |  SELECT labeled,
         |    len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS zh,
         |${graft.functions.TextFunctions.LangWords.map { case (lang, ws) =>
             s"    len(list_filter(toks, x -> x IN (${ws.map(w => s"'$w'").mkString(", ")}))) AS $lang"
           }.mkString(",\n")}
         |  FROM d)
         |SELECT labeled,
         |  CASE WHEN zh > 0 THEN 'zh'
         |       WHEN en >= es AND en >= de AND en >= fr AND en > 0 THEN 'en'
         |       WHEN es >= de AND es >= fr AND es > 0 THEN 'es'
         |       WHEN de >= fr AND de > 0 THEN 'de'
         |       WHEN fr > 0 THEN 'fr'
         |       ELSE 'und' END AS detected,
         |  COUNT(*) AS n
         |FROM scores GROUP BY 1, 2 ORDER BY labeled, detected""".stripMargin)
}
