package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.tables.TableStore

/** Exactly-once streaming APPEND into a [[TableStore]] table — the bronze
  * ingest leg of a streaming medallion pipeline (stream → bronze append →
  * SCD2 silver via [[StreamingUpsert]]).
  *
  * Structured Streaming's `foreachBatch` contract is at-least-once: after
  * a crash between sink commit and checkpoint advance, the last micro-batch
  * is REPLAYED. A plain append sink would duplicate those rows. This sink
  * makes the append idempotent by recording the micro-batch id inside the
  * table-store commit itself (the manifest's operation label,
  * `stream_append:<id>`), so the data write and the progress marker are
  * ONE atomic commit — the transactional-sink pattern Delta's streaming
  * writer uses, reduced to the manifest store:
  *
  *  - batch id ≤ the table's highest committed id → duplicate delivery →
  *    skipped entirely;
  *  - otherwise append the batch's rows as new files (current files carry
  *    over untouched — the cheapest possible write at 100 TB).
  */
object StreamingIngest {

  /** The per-batch function, exposed so tests can drive replays directly. */
  def appendBatch(store: TableStore, table: String)(batch: DataFrame, batchId: Long): Unit =
    if (!store.lastStreamBatch(table).exists(_ >= batchId)) {
      if (!store.exists(table))
        store.createOrReplace(table, batch.sparkSession.createDataFrame(
          batch.sparkSession.sparkContext.emptyRDD[Row], batch.schema))
      store.append(table, batch, op = s"stream_append:$batchId")
    }

  def appendSink(stream: DataFrame, store: TableStore, table: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch(appendBatch(store, table) _)
}
