package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.{Dedup, MergeInto}
import graft.tables.TableStore

/** Incremental near-duplicate dedup for a document STREAM: each micro-batch
  * computes MinHash LSH band keys, joins them against the persisted
  * signature store, and appends only the documents that collide with
  * nothing seen before — the continuously-running form of
  * [[Dedup.firstSeenDedup]], the ingest gate a training-corpus pipeline
  * runs in front of its bronze layer.
  *
  * Semantics: a document is KEPT iff no document with a SMALLER id
  * anywhere in the data shares one of its band keys — dropped documents
  * still block later near-dups of themselves. That invariant holds for
  * ANY arrival order, not just id-monotone streams: when a smaller-id
  * document arrives AFTER a colliding larger-id one was already kept
  * (retries, multi-producer upstreams), the batch RETRACTS the
  * larger-id row from the kept table (a keyed MatchedDelete merge) while
  * its signatures stay to keep blocking — so the kept set is a function
  * of the data alone, independent of micro-batch boundaries, and
  * converges to [[graft.queries.ExtensionQueries]] x28, the
  * oracle-backed batch twin.
  *
  * Exactly-once under foreachBatch's at-least-once contract, with no batch
  * markers: both writes are INSERT-ONLY merges keyed on their natural ids
  * ((doc,band,key) for signatures, doc for kept docs), so replaying a
  * micro-batch re-derives the same rows and inserts nothing — and because
  * collision checks compare `other.doc < this.doc`, a replayed batch's own
  * already-stored signatures never shadow its documents. The insert-only
  * merge is also the table store's cheapest write: it appends new files
  * and rewrites nothing.
  */
object StreamingDedup {

  def minhashDedupSink(
      stream: DataFrame,
      store: TableStore,
      keptTable: String,
      sigTable: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3, bands: Int = 4, rows: Int = 2): DataStreamWriter[Row] = {
    // Driver-side OVER-approximation of the kept table's max id: seeded
    // from one table scan on the first batch after every (re)start, then
    // grown from each batch's own candidate inserts. Growth only — a
    // retraction can only remove a row at or below the bound, so the
    // bound never under-states the true max, which is the safe direction
    // for the gate below. One sink instance owns its tables (the
    // exactly-once argument already requires that), so no other writer
    // can move the true max behind this bound.
    // All ORDER comparisons against the bound happen in Spark expressions
    // (min(..) < lit(bound), greatest(max(..), lit(bound))), never in
    // driver-side Java compareTo: for string ids Java's UTF-16 code-unit
    // order disagrees with Spark's UTF8String byte order on
    // supplementary-plane characters (U+10000 sorts below U+FFFF in Java
    // but above in Spark), and a gate built on the wrong ordering could
    // skip a NEEDED retraction — silently breaking the "kept set is a
    // function of the data alone" invariant the batch twin pins.
    var keptMax: Any = null
    var seeded = false
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val sigs = Dedup.bandKeys(batch, idCol, textCol, n, bands, rows)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        if (!store.exists(sigTable))
          store.createEmpty(sigTable, sigs.schema)
        if (!store.exists(keptTable))
          store.createEmpty(keptTable, batch.schema)

        // collision = any band key shared with a SMALLER doc id, whether it
        // arrived in an earlier batch (signature store) or this one
        val seen = store.read(sigTable).unionByName(sigs)
        val dropped = sigs.alias("a").join(seen.alias("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
              col("b.doc") < col("a.doc"), "left_semi")
          .select(col("a.doc")).distinct()
        val kept = batch.join(dropped, batch(idCol) === dropped("doc"), "left_anti")

        // out-of-order arrival: a previously-KEPT doc colliding with a
        // strictly smaller id in THIS batch lost its first-seen claim —
        // retract it (its signatures stay: dropped docs keep blocking).
        // Replay-idempotent: after the delete the kept table no longer
        // holds the row, so a replayed batch computes an empty retract
        // set. Both sides are band-key equi-joins — no driver collect.
        //
        // GATED: a retraction needs a batch doc id strictly below some
        // kept id, so when the batch's min id is at or above the kept
        // max (every id-monotone stream, i.e. the insert-only common
        // case) the pre-pass — a sigTable x keptTable x batch-sigs join
        // plus a full merge, cost growing with table size — is provably
        // empty and skipped outright.
        if (!seeded) {
          keptMax = store.read(keptTable)
            .agg(max(col(idCol))).head().get(0)
          seeded = true
        }
        val needRetract = keptMax != null && sigs
          .agg(coalesce(
            min(col("doc")) < lit(keptMax).cast(sigs.schema("doc").dataType),
            lit(false)))
          .head().getBoolean(0)
        if (needRetract) {
          val retractIds = store.read(sigTable)
            .join(store.read(keptTable).select(col(idCol).as("doc")), "doc")
            .alias("b")
            .join(sigs.alias("a"),
              col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
                col("a.doc") < col("b.doc"), "left_semi")
            .select(col("b.doc")).distinct()
          store.merge(keptTable, retractIds.withColumnRenamed("doc", idCol),
            keys = Seq(idCol),
            matched = Seq(MergeInto.MatchedDelete(None)))
        }

        store.merge(sigTable, sigs, keys = Seq("doc", "band", "key"),
          notMatched = Seq(MergeInto.NotMatchedInsert(None,
            Seq("doc", "band", "key").map(c => c -> col(s"s.$c")).toMap)))
        store.merge(keptTable, kept, keys = Seq(idCol),
          notMatched = Seq(MergeInto.NotMatchedInsert(None,
            batch.columns.toSeq.map(c => c -> col(s"s.$c")).toMap)))
        // grow the bound by this batch's candidate inserts (an over-
        // approximation: rows the insert-only merge skipped or a later
        // batch retracts only leave the bound above the true max);
        // `greatest` skips nulls, so an empty batch or a null prior
        // bound degrades to the other operand
        val grown = kept
          .agg(greatest(
            max(col(idCol)),
            lit(keptMax).cast(kept.schema(idCol).dataType)))
          .head().get(0)
        if (grown != null) keptMax = grown
      } finally sigs.unpersist()
    }
  }
}
