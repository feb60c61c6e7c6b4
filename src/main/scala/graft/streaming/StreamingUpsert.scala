package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.TimestampType
import graft.operators.{MergeInto, Scd}
import graft.tables.TableStore

/** Streaming upsert sink: applies each micro-batch as an SCD2 merge into a
  * [[TableStore]] table via `foreachBatch` — the open-source equivalent of
  * Delta's streaming MERGE sink, and the piece that turns the batch
  * medallion pipeline into a continuously-updating one (bronze stream →
  * silver history without a rewrite of stage logic).
  *
  * Each micro-batch runs the reference's two-phase SCD2 (close changed +
  * vanished current rows, then insert the new current versions —
  * 22_ETL_Silver_PySpark.py:62-101) as TWO STORE MERGES, so the write
  * inherits the store's file-pruned copy-on-write: phase 1 rewrites only
  * files holding current rows, and phase 2 is an insert-only merge — a
  * pure append of new files. A micro-batch against a 100 TB history table
  * therefore costs the current-row slice plus the batch, never the
  * history.
  *
  * Batch timestamps come from the micro-batch id through `tsForBatch`, so
  * every row of one micro-batch shares a version boundary — the same
  * statement-level-timestamp semantics the batch pipeline uses
  * (SURVEY.md §2.9 note).
  *
  * Exactly-once: TableStore's snapshot swap is atomic, and replaying a
  * micro-batch with identical data is a no-op by SCD2 idempotence (no row
  * satisfies the change predicate, every key already has a current row),
  * which is what makes the sink safe under Structured Streaming's
  * at-least-once foreachBatch contract.
  */
object StreamingUpsert {

  def scd2Sink(
      stream: DataFrame,
      store: TableStore,
      table: String,
      keys: Seq[String],
      tsForBatch: Long => Column): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val ts = tsForBatch(batchId).cast(TimestampType)
      if (!store.exists(table)) store.createOrReplace(table, Scd.scd2Init(batch, ts))
      else {
        val payload = batch.columns.filterNot(keys.contains).toSeq
        val audit = Scd.hasAudit(store.read(table))
        val currentOnly = col(s"t.${Scd.ValidTo}").isNull
        val closeSet = Map(Scd.ValidTo -> (ts: Column)) ++
          (if (audit) Map(Scd.UpdateDate -> (ts: Column)) else Map.empty)

        // phase 1 — close changed + vanished current rows (file-pruned)
        store.merge(table, batch, keys,
          extraOn = Some(currentOnly),
          matched = Seq(MergeInto.MatchedUpdate(
            Some(Scd.changePredicate(payload, nullSafe = false)), closeSet)),
          notMatchedBySource = Seq(MergeInto.BySourceUpdate(Some(currentOnly), closeSet)))

        // phase 2 — insert the new current versions (insert-only: appends
        // new files, rewrites nothing)
        val insertValues: Map[String, Column] =
          (keys ++ payload).map(c => c -> col(s"s.$c")).toMap +
            (Scd.ValidFrom -> (ts: Column)) +
            (Scd.ValidTo -> lit(null).cast(TimestampType)) ++
            (if (audit) Map(Scd.CreateDate -> (ts: Column), Scd.UpdateDate -> (ts: Column))
             else Map.empty)
        store.merge(table, batch, keys,
          extraOn = Some(currentOnly),
          notMatched = Seq(MergeInto.NotMatchedInsert(None, insertValues)))
      }
    }
}
