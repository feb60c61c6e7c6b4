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

        // batch rows whose key already has a current row with a different
        // payload: these need BOTH a close of the old version (their
        // real-key copy matches) and an insert of the new one (their
        // null-key copy cannot match, so it reaches the insert clause)
        val current = store.read(table).filter(col(Scd.ValidTo).isNull)
        val changed = batch.alias("s")
          .join(current.alias("t"),
            keys.map(k => col(s"s.$k") === col(s"t.$k")).reduce(_ && _))
          .filter(Scd.changePredicate(payload, nullSafe = false))
          .select(batch.columns.map(c => col(s"s.$c")).toSeq: _*)

        // every source row carries its real key in __nk_* side columns;
        // the duplicates null the join keys themselves
        def withNk(df: DataFrame, nullKeys: Boolean): DataFrame = df.select(
          (df.columns.map(c =>
            if (nullKeys && keys.contains(c)) lit(null).cast(df.schema(c).dataType).as(c)
            else col(c)) ++
            keys.map(k => col(k).as(s"__nk_$k"))).toSeq: _*)
        val source = withNk(batch, nullKeys = false)
          .unionByName(withNk(changed, nullKeys = true))

        val insertValues: Map[String, Column] =
          keys.map(k => k -> col(s"s.__nk_$k")).toMap ++
            payload.map(c => c -> col(s"s.$c")) +
            (Scd.ValidFrom -> (ts: Column)) +
            (Scd.ValidTo -> lit(null).cast(TimestampType)) ++
            (if (audit) Map(Scd.CreateDate -> (ts: Column), Scd.UpdateDate -> (ts: Column))
             else Map.empty)

        store.merge(table, source, keys,
          extraOn = Some(currentOnly),
          matched = Seq(MergeInto.MatchedUpdate(
            Some(Scd.changePredicate(payload, nullSafe = false)), closeSet)),
          notMatched = Seq(MergeInto.NotMatchedInsert(None, insertValues)),
          notMatchedBySource = Seq(MergeInto.BySourceUpdate(Some(currentOnly), closeSet)))
      }
    }
}
