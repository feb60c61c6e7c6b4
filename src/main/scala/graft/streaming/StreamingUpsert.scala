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
  * Batch timestamps come from the micro-batch id through `tsForBatch`, so
  * every row of one micro-batch shares a version boundary — the same
  * statement-level-timestamp semantics the batch pipeline uses
  * (SURVEY.md §2.9 note).
  *
  * Exactly-once: TableStore's snapshot swap is atomic, and replaying a
  * micro-batch with identical data is a no-op by SCD2 idempotence, which is
  * what makes the sink safe under Structured Streaming's at-least-once
  * foreachBatch contract.
  */
object StreamingUpsert {

  def scd2Sink(
      stream: DataFrame,
      store: TableStore,
      table: String,
      keys: Seq[String],
      tsForBatch: Long => Column): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val ts = tsForBatch(batchId)
      if (!store.exists(table)) store.createOrReplace(table, Scd.scd2Init(batch, ts))
      else store.createOrReplace(table,
        Scd.scd2Merge(store.read(table), batch, keys, ts))
    }
}
