package graft.sources

import java.util

import org.apache.spark.sql.{GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.tables.TableStore

/** [[graft.tables.TableStore]] tables as a first-class Spark DataSource V2
  * — the missing half of the lakehouse streaming story: the store was
  * already a streaming SINK (StreamingIngest/StreamingUpsert); this makes
  * it a streaming SOURCE, Delta's `spark.readStream.table(...)`:
  *
  * {{{
  *   spark.readStream.format("graft-table")
  *     .option("root", store.rootDir).option("table", "bronze.events")
  *     .load()
  * }}}
  *
  * Micro-batch planning is pure MANIFEST arithmetic on the driver — an
  * offset is a committed snapshot version, and a batch is the set of data
  * files ADDED between two versions (manifest diff, no data read). Since
  * round 5 a manifest becomes visible only when its commit swaps
  * (`_MANIFEST.staged` → `_MANIFEST` under the commit lock), so the source
  * can never observe a half-committed version. Executors read the planned
  * files through Spark's own parquet machinery
  * ([[GraftShims.parquetFileReader]]) with the STREAM's fixed schema, so
  * files written before a metadata-only `ADD COLUMNS` NULL-fill exactly
  * like the batch reader.
  *
  * Semantics (Delta streaming-source parity):
  *  - default start = the full CURRENT snapshot as the first batch, then
  *    per-commit increments (`startingVersion` = N streams changes from
  *    version N on; `latest` streams only future commits);
  *  - layout-only commits (op `optimize` — compaction, Z-order) are
  *    SKIPPED: they move rows between files without changing data, the
  *    `dataChange=false` rule;
  *  - a commit that removes files or attaches deletion vectors is a
  *    data-changing rewrite the append-only contract can't represent:
  *    the stream fails with the remediation options (`ignoreChanges` to
  *    stream just the added files, or restart from a fresh snapshot).
  *
  * At 100 TB this plans in manifest-size time: a micro-batch never lists
  * directories, and commit/offset bookkeeping rides Structured Streaming's
  * checkpoint (exactly-once with an idempotent or transactional sink).
  */
class GraftTableSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTableSource.withStore(options) { (store, table) =>
      store.read(table).schema
    }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftStreamTable(schema, new CaseInsensitiveStringMap(properties))
}

private[sources] object GraftTableSource {
  /** Open the store named by the options for one driver-side metadata
    * call. The constructor self-registers for SQL-DML routing, which
    * would make the user's own attached store ambiguous — detach
    * immediately; the source never routes SQL. */
  def withStore[T](options: CaseInsensitiveStringMap)(f: (TableStore, String) => T): T = {
    val root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException("graft-table source: option 'root' (store root dir) is required"))
    val table = Option(options.get("table")).getOrElse(
      throw new IllegalArgumentException("graft-table source: option 'table' (db.table) is required"))
    val store = new TableStore(SparkSession.active, root)
    try f(store, table) finally store.detach()
  }
}

private[sources] class GraftStreamTable(schema: StructType,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"graft-table:${options.get("table")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftTableScan(schema, options)
    }
}

private[sources] class GraftTableScan(schema: StructType,
    options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = schema
  override def description(): String = s"GraftTableScan(${options.get("table")})"

  override def toBatch: Batch = new Batch {
    private val files = GraftTableSource.withStore(options) { (store, table) =>
      val v = store.version(table).getOrElse(
        throw new IllegalArgumentException(s"table not found: $table"))
      val (_, _, fs) = store.snapshotInventory(table, v)
      require(fs.forall(!_._3),
        s"$table carries deletion vectors — the direct file source cannot " +
          "apply them; read through the store (store.read) or OPTIMIZE first")
      fs
    }
    override def planInputPartitions(): Array[InputPartition] =
      files.map { case (p, len, _) => GraftFilePartition(p, len) }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftFileReaderFactory(GraftShims.parquetFileReader(SparkSession.active, schema))
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftTableMicroBatchStream(schema, options)
}

/** Offset = committed snapshot version; version 0 = "before the first
  * commit" (its successor batch is the full initial snapshot). */
private[sources] case class GraftVersionOffset(version: Int) extends Offset {
  override def json(): String = version.toString
}

private[sources] case class GraftFilePartition(path: String, length: Long)
  extends InputPartition

private[sources] class GraftFileReaderFactory(
    readerFor: (String, Long) => Iterator[InternalRow]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    new PartitionReader[InternalRow] {
      private val iter = readerFor(p.path, p.length)
      private var row: InternalRow = _
      override def next(): Boolean = { val has = iter.hasNext; if (has) row = iter.next(); has }
      override def get(): InternalRow = row
      override def close(): Unit = () // underlying reader closes on task completion
    }
  }
}

private[sources] class GraftTableMicroBatchStream(schema: StructType,
    options: CaseInsensitiveStringMap) extends MicroBatchStream {

  private val table = options.get("table")
  private val ignoreChanges = options.getBoolean("ignoreChanges", false)

  private def withStore[T](f: (TableStore, String) => T): T =
    GraftTableSource.withStore(options)(f)

  override def initialOffset(): Offset = withStore { (store, t) =>
    val cur = store.version(t).getOrElse(
      throw new IllegalArgumentException(s"table not found: $t"))
    Option(options.get("startingVersion")) match {
      case None => GraftVersionOffset(0) // first batch = full current snapshot
      case Some("latest") => GraftVersionOffset(cur)
      case Some(v) => GraftVersionOffset(v.toInt - 1) // stream changes OF version v on
    }
  }

  override def latestOffset(): Offset = withStore { (store, t) =>
    GraftVersionOffset(store.version(t).getOrElse(0))
  }

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftVersionOffset].version
    val to = end.asInstanceOf[GraftVersionOffset].version
    if (to <= from) return Array.empty
    withStore { (store, t) =>
      val adds: Seq[(String, Long)] =
        if (from == 0) {
          // initial snapshot: the CURRENT file set, no diffing (older
          // versions may be vacuumed; the snapshot needs only `to`)
          val (_, _, fs) = store.snapshotInventory(t, to)
          val dv = fs.filter(_._3)
          require(dv.isEmpty || ignoreChanges,
            s"$t's snapshot carries deletion vectors the file-level source cannot " +
              "apply — OPTIMIZE the table to fold them, or set ignoreChanges=true " +
              "to stream the DV'd files as-written (deleted rows reappear)")
          fs.map { case (p, len, _) => (p, len) }
        } else (from + 1 to to).flatMap { v =>
          val (_, op, cur) = store.snapshotInventory(t, v)
          if (op == "optimize") Nil // layout-only rewrite: dataChange=false
          else {
            val (_, _, prev) = store.snapshotInventory(t, v - 1)
            val prevByPath = prev.map(f => f._1 -> f._3).toMap
            val added = cur.filterNot(f => prevByPath.contains(f._1))
            val removed = prev.map(_._1).filterNot(cur.map(_._1).toSet)
            val dvChanged = cur.exists(f => prevByPath.get(f._1).exists(_ != f._3))
            if ((removed.nonEmpty || dvChanged || added.exists(_._3)) && !ignoreChanges)
              throw new IllegalStateException(
                s"$t version $v is not append-only (files removed/rewritten or deletion " +
                  "vectors attached) — a streaming source over it would miss or duplicate " +
                  "rows. Set ignoreChanges=true to stream only the added files, or " +
                  "restart the stream from a fresh snapshot (drop startingVersion).")
            added.filterNot(_._3).map { case (p, len, _) => (p, len) }
          }
        }
      adds.map { case (p, len) => GraftFilePartition(p, len) }.toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftFileReaderFactory(GraftShims.parquetFileReader(SparkSession.active, schema))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftTableMicroBatchStream($table)"
}
