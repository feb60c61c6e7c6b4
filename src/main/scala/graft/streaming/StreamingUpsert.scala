package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.Scd
import graft.tables.TableStore

/** Streaming upsert sink: applies each micro-batch as an SCD2 merge into a
  * [[TableStore]] table via `foreachBatch` — the open-source equivalent of
  * Delta's streaming MERGE sink, and the piece that turns the batch
  * medallion pipeline into a continuously-updating one (bronze stream →
  * silver history without a rewrite of stage logic).
  *
  * Each micro-batch applies the reference's SCD2 semantics (close changed +
  * vanished current rows, insert the new current versions —
  * 22_ETL_Silver_PySpark.py:62-101) as ONE store merge, using the
  * null-merge-key duplication shape: batch rows whose key exists with a
  * changed payload appear in the merge source twice — once under their
  * real key (matches → closes the old current row) and once with the key
  * columns nulled (null never equi-matches → falls to the insert clause,
  * carrying the real key in side columns). A single merge is a single
  * atomic snapshot commit, so a concurrent reader sees either the whole
  * micro-batch or none of it — there is no window where a key's current
  * row is closed but its replacement not yet inserted (the two-commit
  * variant this replaces had exactly that window, durable under a crash
  * between the commits).
  *
  * The write inherits the store's file-pruned copy-on-write: only files
  * holding matched current rows rewrite, inserts append new files. A
  * micro-batch against a 100 TB history table therefore costs the
  * current-row slice plus the batch, never the history.
  *
  * Batch timestamps come from the micro-batch id through `tsForBatch`, so
  * every row of one micro-batch shares a version boundary — the same
  * statement-level-timestamp semantics the batch pipeline uses
  * (SURVEY.md §2.9 note).
  *
  * Exactly-once: TableStore's snapshot swap is atomic, and replaying a
  * micro-batch with identical data is a no-op by SCD2 idempotence (the
  * change predicate matches nothing, the changed-row pre-join is empty so
  * no insert duplicates exist, and every key already has a current row),
  * which is what makes the sink safe under Structured Streaming's
  * at-least-once foreachBatch contract. The table is single-writer by the
  * streaming contract (one query owns its sink table); the changed-row
  * pre-join and the merge read the same committed snapshot under that
  * contract.
  */
object StreamingUpsert {

  /** `snapshotBatches` states the micro-batch CONTRACT and must match the
    * upstream: `true` (the reference's shape) means every micro-batch is a
    * COMPLETE key snapshot, so a key absent from a batch has genuinely
    * vanished and its current row closes. For an incremental/CDC-style
    * stream — where a batch carries only the keys that changed — pass
    * `false`: close-vanished semantics would otherwise close the current
    * row of every key that merely sat out one micro-batch, leaving
    * long-lived keys with no current row though nothing deleted them
    * upstream. */
  def scd2Sink(
      stream: DataFrame,
      store: TableStore,
      table: String,
      keys: Seq[String],
      tsForBatch: Long => Column,
      snapshotBatches: Boolean = true): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // the merge shape itself (null-merge-key duplication, one atomic
      // commit per batch) is shared with the batch medallion — see
      // Scd.scd2ApplyBatch for the semantics and scale notes
      // pruneCurrentByBatchKeyRange: the change-detection pre-join is
      // gated by the batch's key box (one tiny agg job per batch) so a
      // narrow micro-batch against a key-clustered 100 TB history costs
      // its overlapping files, not the whole current slice — the same
      // per-batch-cost-tracks-the-batch audit StreamingDedup's retraction
      // gate closed in r14
      Scd.scd2ApplyBatch(store, table, batch, keys, tsForBatch(batchId),
        closeVanished = snapshotBatches,
        pruneCurrentByBatchKeyRange = true)
    }
}
