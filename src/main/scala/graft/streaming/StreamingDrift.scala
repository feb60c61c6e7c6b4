package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.functions.TextFunctions
import graft.operators.MergeInto
import graft.tables.TableStore

/** At-arrival drift monitoring as a STREAM sink — the push-model member
  * of the drift family (x94 is the one-shot rescan, x102 the incremental
  * at-arrival compare driven by sequential calls): every arriving
  * micro-batch is compared against the unigram profile accumulated from
  * ALL PRIOR batches BEFORE it merges, and the top-K drifted terms land
  * in a report table keyed by micro-batch id. The alert fires inside the
  * stream itself — no orchestrator, no nightly rescan.
  *
  * State is never executor memory: the profile lives in a store table
  * absorbed through vocab-keyed file-pruned MERGEs, so the monitor
  * survives restarts (streaming checkpoint + store commits) and a 100 TB
  * corpus costs each batch one tokenize+count and one vocab-sized merge —
  * x102's economics with the push model's latency.
  *
  * Per-batch cost audit (the r14/r15 streaming-sink sweep): the report
  * step reads the WHOLE profile table each batch and the absorb step
  * merges into it — both grow with PROFILE size, not batch size. That is
  * inherent to drift comparison (the report is "batch vs everything seen
  * so far") and bounded in a different way: the profile holds one row per
  * DISTINCT TERM, so it is vocabulary-sized — sublinear in the corpus and
  * effectively capped by the language (Heaps' law), not something a gate
  * can skip. The merge itself stays candidate-bounded like every store
  * merge.
  *
  * Exactly-once under foreachBatch's at-least-once contract via
  * [[StreamingIngest]]'s transactional-label pattern: the report append
  * and the profile merge each carry the micro-batch id as their commit's
  * `stream_append:<id>` label, so a replayed batch is recognized PER
  * TABLE and skipped — a crash between the two commits replays into
  * "report already written, merge completes", never a double absorb and
  * never a missing report.
  */
object StreamingDrift {

  /** Unigram counts (term, c) of a document batch — the drift unit. */
  def unigramCounts(batch: DataFrame, textCol: String): DataFrame = batch
    .select(explode(filter(
      split(TextFunctions.normalizeText(col(textCol)), " "),
      w => length(w) > 0)).as("term"))
    .groupBy(col("term")).agg(count(lit(1)).as("c"))

  /** The batch-vs-profile compare (x102's exact shape): per-term counts,
    * integer micro-unit rates on both sides, top-K by absolute rate
    * delta. */
  def compareToProfile(profile: DataFrame, batchCounts: DataFrame,
      topK: Int): DataFrame = {
    val ptot = profile.agg(sum(col("c")).cast("long").as("ptot"))
    val btot = batchCounts.agg(sum(col("c")).cast("long").as("btot"))
    profile.select(col("term"), col("c").as("c_profile"))
      .join(batchCounts.select(col("term"), col("c").as("c_batch")),
        Seq("term"), "full_outer")
      .crossJoin(broadcast(ptot)).crossJoin(broadcast(btot))
      .select(col("term"),
        coalesce(col("c_profile"), lit(0L)).as("c_profile"),
        coalesce(col("c_batch"), lit(0L)).as("c_batch"),
        expr("(coalesce(c_profile, 0L) * 1000000L) div ptot").as("p_profile_micro"),
        expr("(coalesce(c_batch, 0L) * 1000000L) div btot").as("p_batch_micro"))
      .withColumn("delta_micro", abs(col("p_profile_micro") - col("p_batch_micro")))
      .orderBy(col("delta_micro").desc, col("term"))
      .limit(topK)
  }

  /** The per-batch function, exposed so tests can drive replays directly.
    * The FIRST batch seeds the profile and produces no report (there is
    * nothing to drift from yet). */
  def driftBatch(store: TableStore, profileTable: String, reportTable: String,
      textCol: String, topK: Int)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    // the counts frame is read up to three times below (emptiness probe,
    // report compare, profile merge) — tokenize the micro-batch ONCE, not
    // once per consumer; released in the finally
    val cnts = unigramCounts(batch, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // an empty micro-batch (stream recovery, or whitespace-only docs)
    // leaves no trace at all: reporting against it would divide by a
    // NULL batch total and append topK null-metric rows, and absorbing
    // it would advance the profile label so a later real batch could
    // compare against an EMPTY profile (the same NULL junk on the other
    // side). Skipping is replay-deterministic — an empty batch is as if
    // it never arrived.
    if (cnts.isEmpty) return
    if (!store.exists(profileTable))
      // empty-create is replay-safe: recreating an empty table is a
      // no-op semantically, and every ABSORB below rides the id-labeled
      // merge — the creation itself never carries data
      store.createOrReplace(profileTable, s.createDataFrame(
        s.sparkContext.emptyRDD[Row], cnts.schema), statsFor = Seq("term"))
    // the profile "has prior" only when it has absorbed a batch BEFORE
    // this one — a replayed batch sees its own id (or higher) and never
    // re-reports against a profile that already contains itself
    val profileHasPrior = store.lastStreamBatch(profileTable).exists(_ < batchId)
    // 1. report at arrival — against the profile of everything BEFORE
    //    this batch (guarded: a replayed batch must not report twice,
    //    and by then the profile already contains the batch itself)
    if (profileHasPrior && !store.lastStreamBatch(reportTable).exists(_ >= batchId)) {
      val report = compareToProfile(store.read(profileTable), cnts, topK)
        .withColumn("batch_id", lit(batchId))
      if (!store.exists(reportTable))
        store.createOrReplace(reportTable, s.createDataFrame(
          s.sparkContext.emptyRDD[Row], report.schema))
      store.append(reportTable, report, op = s"stream_append:$batchId")
    }
    // 2. absorb the batch into the profile (idempotent on replay)
    if (!store.lastStreamBatch(profileTable).exists(_ >= batchId))
      store.merge(profileTable, cnts, Seq("term"),
        matched = Seq(MergeInto.MatchedUpdate(None,
          Map("c" -> (col("t.c") + col("s.c"))))),
        notMatched = Seq(MergeInto.NotMatchedInsert(None,
          Map("term" -> col("s.term"), "c" -> col("s.c")))),
        op = s"stream_append:$batchId")
    } finally cnts.unpersist(false)
  }

  def driftSink(stream: DataFrame, store: TableStore, profileTable: String,
      reportTable: String, textCol: String, topK: Int = 10): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch(
      driftBatch(store, profileTable, reportTable, textCol, topK) _)
}
