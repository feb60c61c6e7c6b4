package graft.tables

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.operators.MergeInto

/** Minimal managed-table layer over parquet with atomic snapshot swap — the
  * stand-in for Delta/Unity-Catalog managed tables (SURVEY.md §1.1, §7.1
  * module 2; reference stores everything in Delta but never touches storage
  * directly, so its DataFrame logic is storage-agnostic).
  *
  * Layout: `root/<db>/<table>/v_<n>/` parquet snapshots + a `_CURRENT`
  * pointer file naming the live version. Writes go to a fresh `v_<n+1>`
  * directory, then the pointer is swapped via atomic file move — readers
  * resolve the pointer at read time and never observe a partial snapshot.
  * Old versions are retained (cheap time travel / debugging; `vacuum`
  * drops them).
  *
  * Known limits vs Delta, by design (SURVEY.md §4 "transactional table
  * replace"): single-writer (no commit protocol arbitration), snapshot
  * granularity = whole table. UPDATE/DELETE (reference
  * 23_Testing_SCD2.py:40-64) are full-snapshot rewrites — exactly how
  * copy-on-write table formats behave without file-level pruning; at 100 TB
  * the same API would sit over partitioned rewrites keyed by the predicate.
  */
/** Non-enforced declarative table metadata (comments, properties, PK). */
final case class TableMeta(
    comment: Option[String] = None,
    columnComments: Map[String, String] = Map.empty,
    properties: Map[String, String] = Map.empty)

object TableStore {
  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, TableStore]()

  /** The store SQL-text DML statements resolve against (last attached wins). */
  def attached(spark: SparkSession): Option[TableStore] = Option(sessions.get(spark))

  def attach(spark: SparkSession, store: TableStore): Unit = sessions.put(spark, store)
}

final class TableStore(spark: SparkSession, root: String) {

  // SQL-text DML (MERGE/UPDATE/DELETE via spark.sql) resolves table names
  // against the session's most recently constructed store — single-writer
  // by design, like the rest of the layer.
  TableStore.attach(spark, this)

  private def tableDir(name: String) = {
    val parts = name.split('.')
    require(parts.length == 2, s"table name must be db.table, got $name")
    Paths.get(root, parts(0), parts(1))
  }

  private def currentVersion(name: String): Option[Int] = {
    val ptr = tableDir(name).resolve("_CURRENT")
    if (Files.exists(ptr)) Some(new String(Files.readAllBytes(ptr)).trim.toInt) else None
  }

  private def swapTo(name: String, version: Int): Unit = {
    val dir = tableDir(name)
    val tmp = dir.resolve(s"_CURRENT.tmp.$version")
    Files.createDirectories(dir)
    Files.write(tmp, version.toString.getBytes)
    Files.move(tmp, dir.resolve("_CURRENT"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def exists(name: String): Boolean = currentVersion(name).isDefined

  /** Whether a database namespace exists under the store root (SQL CTAS
    * lowers only into existing store namespaces). */
  def dbExists(db: String): Boolean = Files.exists(Paths.get(root, db))

  /** K2: declare an empty table from an explicit schema (the reference's
    * CREATE OR REPLACE TABLE DDL, constraints recorded as metadata only —
    * Spark cannot enforce PK/FK, SURVEY.md §1.1). */
  def createEmpty(name: String, schema: org.apache.spark.sql.types.StructType): Unit =
    createOrReplace(name, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))

  /** K1/K2/K3: overwrite-create a table from a DataFrame snapshot.
    * `partitionBy` lays the snapshot out hive-style so predicate columns
    * prune whole directories at the scan — at 100 TB this is what keeps a
    * current-version SCD2 read from touching history files at all.
    * `sortWithin` sorts rows inside each task before writing, so parquet
    * row-group min/max statistics on those columns become selective — the
    * file-level pruning lever once directory partitioning is exhausted. */
  def createOrReplace(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
      sortWithin: Seq[String] = Nil): Unit = {
    val next = currentVersion(name).getOrElse(0) + 1
    val sorted =
      if (sortWithin.nonEmpty) df.sortWithinPartitions(sortWithin.map(df(_)): _*) else df
    val w = sorted.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tableDir(name).resolve(s"v_$next").toString)
    swapTo(name, next)
  }

  /** SCD2-layout write: partitions the history by a derived `is_current`
    * flag so `_tf_valid_to IS NULL` readers never open closed-version
    * files. */
  def createOrReplaceScd2(name: String, df: DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    createOrReplace(name,
      df.withColumn("is_current", col(graft.operators.Scd.ValidTo).isNull),
      partitionBy = Seq("is_current"))
  }

  def read(name: String): DataFrame = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalArgumentException(s"table not found: $name"))
    readVersion(name, v)
  }

  /** Time travel: read a specific retained snapshot version. */
  def readVersion(name: String, version: Int): DataFrame =
    spark.read.parquet(tableDir(name).resolve(s"v_$version").toString)

  /** All retained snapshot versions, oldest first. */
  def versions(name: String): Seq[Int] = {
    val dir = tableDir(name)
    if (!Files.exists(dir)) Seq.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      Files.list(dir).forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("v_")) out += n.stripPrefix("v_").toInt
      }
      out.sorted.toSeq
    }
  }

  /** K6: UPDATE … SET … WHERE — copy-on-write rewrite. */
  def update(name: String, cond: Column, set: Map[String, Column]): Unit = {
    val cur = read(name)
    import org.apache.spark.sql.functions.when
    val updated = cur.columns.foldLeft(cur) { (df, c) =>
      set.get(c).map(v => df.withColumn(c, when(cond, v).otherwise(df(c)))).getOrElse(df)
    }
    createOrReplace(name, updated)
  }

  /** K6: DELETE FROM … WHERE — copy-on-write rewrite. */
  def delete(name: String, cond: Column): Unit =
    createOrReplace(name, read(name).filter(!cond || cond.isNull))

  /** K5: MERGE INTO applied to a stored table. */
  def merge(
      name: String,
      source: DataFrame,
      keys: Seq[String],
      extraOn: Option[Column] = None,
      matched: Seq[MergeInto.MatchedAction] = Nil,
      notMatched: Seq[MergeInto.NotMatchedInsert] = Nil,
      notMatchedBySource: Seq[MergeInto.BySourceAction] = Nil): Unit =
    createOrReplace(name,
      MergeInto(read(name), source, keys, extraOn, matched, notMatched, notMatchedBySource))

  /** Table-level metadata sidecar: the reference's COMMENT clauses and
    * TBLPROPERTIES/constraint DDL (01_Init.py:58-77, 236-241 — column
    * comments, table comment, PRIMARY KEY recorded as metadata; Spark
    * cannot enforce PK/FK either, SURVEY.md §1.1). Stored as a properties
    * file beside the snapshots, so metadata survives every snapshot swap
    * and is versioned with the table directory. */
  def setMeta(name: String, meta: TableMeta): Unit = {
    val p = new java.util.Properties()
    meta.comment.foreach(p.setProperty("comment", _))
    meta.columnComments.foreach { case (c, v) => p.setProperty(s"col.$c", v) }
    meta.properties.foreach { case (k, v) => p.setProperty(s"prop.$k", v) }
    val dir = tableDir(name)
    Files.createDirectories(dir)
    val out = Files.newOutputStream(dir.resolve("_META"))
    try p.store(out, null) finally out.close()
  }

  def meta(name: String): TableMeta = {
    val f = tableDir(name).resolve("_META")
    if (!Files.exists(f)) TableMeta()
    else {
      val p = new java.util.Properties()
      val in = Files.newInputStream(f)
      try p.load(in) finally in.close()
      import scala.jdk.CollectionConverters._
      val entries = p.asScala.toMap
      TableMeta(
        comment = entries.get("comment"),
        columnComments = entries.collect { case (k, v) if k.startsWith("col.") => k.stripPrefix("col.") -> v },
        properties = entries.collect { case (k, v) if k.startsWith("prop.") => k.stripPrefix("prop.") -> v })
    }
  }

  /** Record a (non-enforced) primary key, like the reference's
    * `ALTER TABLE … ADD PRIMARY KEY` (01_Init.py:239-241). */
  def setPrimaryKey(name: String, cols: Seq[String]): Unit =
    setMeta(name, meta(name).copy(properties =
      meta(name).properties + ("primary_key" -> cols.mkString(","))))

  /** Drop all non-current snapshot versions. */
  def vacuum(name: String): Unit = {
    val keep = currentVersion(name)
    val dir = tableDir(name)
    if (Files.exists(dir)) {
      Files.list(dir).forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("v_") && keep.forall(v => n != s"v_$v")) {
          Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.delete(f))
        }
      }
    }
  }
}
