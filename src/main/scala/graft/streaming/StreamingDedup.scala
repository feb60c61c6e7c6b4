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
  * Semantics: a document is dropped iff any document with a SMALLER id
  * (earlier in stream order) shares one of its band keys — dropped
  * documents still block later near-dups of themselves, so the kept set is
  * a function of the data alone, independent of micro-batch boundaries;
  * [[graft.queries.ExtensionQueries]] x28 is the oracle-backed batch twin.
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
      n: Int = 3, bands: Int = 4, rows: Int = 2): DataStreamWriter[Row] =
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

        store.merge(sigTable, sigs, keys = Seq("doc", "band", "key"),
          notMatched = Seq(MergeInto.NotMatchedInsert(None,
            Seq("doc", "band", "key").map(c => c -> col(s"s.$c")).toMap)))
        store.merge(keptTable, kept, keys = Seq(idCol),
          notMatched = Seq(MergeInto.NotMatchedInsert(None,
            batch.columns.toSeq.map(c => c -> col(s"s.$c")).toMap)))
      } finally sigs.unpersist()
    }
}
