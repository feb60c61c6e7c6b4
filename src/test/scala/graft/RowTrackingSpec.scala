package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tables.TableStore
import graft.operators.MergeInto

/** Delta-style row tracking: every row gets a STABLE id that survives
  * copy-on-write UPDATE/DELETE, deletion-vector DML, OPTIMIZE (plain and
  * Z-order), MERGE and selective overwrite. Fresh files own the manifest
  * range [base, base + rows) claimed under the commit lock; rewrites
  * materialize the id in a hidden parquet column the manifest schema
  * never lists, so plain reads are byte-for-byte unaffected. */
class RowTrackingSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)

  private def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft_rt").toString)

  /** k → _row_id map of the current snapshot. */
  private def ids(store: TableStore, name: String): Map[Long, Long] =
    store.readWithRowIds(name).select(col("k"), col("_row_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def seed(store: TableStore, n: Int = 1000): Unit = {
    store.createOrReplace("db.t",
      spark.range(0, n).select(col("id").as("k"), (col("id") % 7).as("g"),
        concat(lit("v"), col("id")).as("v")).repartition(4),
      sortWithin = Seq("k"))
    store.enableRowTracking("db.t")
  }

  test("enable backfills the snapshot: ids are unique, dense and stable") {
    val store = freshStore()
    seed(store)
    val m = ids(store, "db.t")
    assert(m.size == 1000, "every row has an id")
    assert(m.values.toSet.size == 1000, "ids are unique")
    assert(m.values.min == 0 && m.values.max == 999, "backfill is dense from 0")
    // plain reads never see the machinery
    assert(store.read("db.t").columns.toSeq == Seq("k", "g", "v"))
    store.detach()
  }

  test("appends mint fresh ids above the high water; old ids stable") {
    val store = freshStore()
    seed(store)
    val before = ids(store, "db.t")
    store.append("db.t", spark.range(5000, 5010).select(
      col("id").as("k"), (col("id") % 7).as("g"), lit("new").as("v")))
    val after = ids(store, "db.t")
    assert(before.forall { case (k, id) => after(k) == id }, "existing ids moved")
    val fresh = (5000L until 5010L).map(after)
    assert(fresh.forall(_ >= 1000), s"fresh ids must not reuse the backfilled range: $fresh")
    assert(fresh.toSet.size == 10)
    store.detach()
  }

  test("copy-on-write UPDATE and DELETE preserve survivor ids") {
    val store = freshStore()
    seed(store)
    val before = ids(store, "db.t")
    store.update("db.t", col("k") % 10 === 3, Map("v" -> lit("updated")))
    val afterU = ids(store, "db.t")
    assert(before == afterU, "UPDATE must not move any id (updated or carried)")
    store.delete("db.t", col("k") % 10 === 4)
    val afterD = ids(store, "db.t")
    assert(afterD.size == 900)
    assert(afterD.forall { case (k, id) => before(k) == id }, "DELETE moved survivor ids")
    store.detach()
  }

  test("deletion-vector DML keeps ids without touching files") {
    val store = freshStore()
    seed(store)
    store.setDmlMode("db.t", "mor")
    val before = ids(store, "db.t")
    store.delete("db.t", col("k") < 100)
    val afterD = ids(store, "db.t")
    assert(afterD.size == 900 && afterD.forall { case (k, id) => before(k) == id })
    store.update("db.t", col("k") >= 900, Map("v" -> lit("mor-up")))
    val afterU = ids(store, "db.t")
    assert(afterU.size == 900 && afterU.forall { case (k, id) => before(k) == id },
      "mor UPDATE must carry ids onto the appended rewrite")
    store.detach()
  }

  test("OPTIMIZE and ZORDER rewrite every file but move no id") {
    val store = freshStore()
    seed(store)
    store.delete("db.t", col("k") % 3 === 0) // make layout non-trivial
    val before = ids(store, "db.t")
    store.compact("db.t", targetFiles = 2)
    assert(ids(store, "db.t") == before, "OPTIMIZE moved ids")
    store.compact("db.t", targetFiles = 4, zorderBy = Seq("k", "g"))
    assert(ids(store, "db.t") == before, "ZORDER moved ids")
    store.detach()
  }

  test("MERGE keeps updated-row ids and mints fresh ids for inserts") {
    val store = freshStore()
    seed(store)
    val before = ids(store, "db.t")
    val source = spark.range(0, 20).select(
        (col("id") * 50).as("k"), lit("merged").as("v"))
      .unionByName(spark.range(0, 5).select(
        (col("id") + 100000).as("k"), lit("inserted").as("v")))
    store.merge("db.t", source, keys = Seq("k"),
      matched = Seq(MergeInto.MatchedUpdate(None, Map("v" -> col("s.v")))),
      notMatched = Seq(MergeInto.NotMatchedInsert(None,
        Map("k" -> col("s.k"), "g" -> (col("s.k") % 7), "v" -> col("s.v")))))
    val after = ids(store, "db.t")
    assert(before.forall { case (k, id) => after(k) == id },
      "merge moved an existing row's id")
    val inserted = (0 until 5).map(i => after(100000L + i))
    assert(inserted.forall(id => !before.values.toSet.contains(id)),
      "inserted rows must mint fresh ids")
    store.detach()
  }

  test("replaceWhere: region rows get fresh ids, other rows keep theirs") {
    val store = freshStore()
    store.createOrReplace("db.t",
      spark.range(0, 1000).select(col("id").as("k"), (col("id") % 4).as("g"),
        lit("x").as("v")),
      partitionBy = Seq("g"))
    store.enableRowTracking("db.t")
    val before = ids(store, "db.t")
    store.overwriteWhere("db.t",
      spark.range(0, 10).select((col("id") * 4 + 2).as("k"), lit(2L).as("g"),
        lit("rw").as("v")),
      col("g") === 2L)
    val after = ids(store, "db.t")
    val untouched = before.filter { case (k, _) => k % 4 != 2 }
    assert(untouched.forall { case (k, id) => after(k) == id },
      "replaceWhere moved ids outside the region")
    store.detach()
  }

  test("restore and clone carry ids; change feed stays clean") {
    val store = freshStore()
    seed(store)
    store.enableChangeFeed("db.t")
    val before = ids(store, "db.t")
    val v0 = store.version("db.t").get
    store.update("db.t", col("k") === 5, Map("v" -> lit("u")))
    assert(!store.changeFeed("db.t", v0, v0 + 1).columns.contains("__graft_rowid"),
      "hidden id column leaked into the change feed")
    store.cloneTo("db.t", "db.t2")
    assert(ids(store, "db.t2") == before ++ Map(5L -> before(5L)), "clone ids differ")
    store.deepCloneTo("db.t", "db.t3")
    assert(ids(store, "db.t3") == before, "deep clone ids differ")
    store.detach()
  }
}
