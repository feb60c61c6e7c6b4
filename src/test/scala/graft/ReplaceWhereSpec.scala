package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tables.TableStore

/** Selective overwrite — Delta's `replaceWhere` and Spark's
  * `INSERT OVERWRITE … PARTITION` (static + dynamic) over store tables.
  * Each test pins the FILE-level behavior: partitions outside the
  * replaced region must carry over physically (never be rewritten), the
  * whole replace must land as ONE commit, and incoming rows that fall
  * outside the region must be rejected, not silently duplicated. */
class ReplaceWhereSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)

  private def dataFiles(root: String, db: String, table: String): Map[String, Long] = {
    val dir = java.nio.file.Paths.get(root, db, table)
    val out = scala.collection.mutable.Map.empty[String, Long]
    Files.walk(dir).forEach { p: Path =>
      if (p.getFileName.toString.endsWith(".parquet"))
        out += (dir.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis)
    }
    out.toMap
  }

  private def freshStore(): (TableStore, String) = {
    val root = Files.createTempDirectory("graft_rw").toString
    (new TableStore(spark, root), root)
  }

  private def seed(store: TableStore): Unit =
    store.createOrReplace("db.t",
      spark.range(0, 1000).select(
        col("id").as("k"), (col("id") % 4).as("par"),
        (col("id") * 2).cast("double").as("v")),
      partitionBy = Seq("par"))

  test("overwriteWhere replaces only the predicate's region, one commit") {
    val (store, root) = freshStore()
    seed(store)
    val before = dataFiles(root, "db", "t")
    val v0 = store.version("db.t").get

    // replace partition 2 with a 10-row recomputation
    store.overwriteWhere("db.t",
      spark.range(0, 10).select(
        (col("id") * 4 + 2).as("k"), lit(2L).as("par"), lit(-1.0).as("v")),
      col("par") === 2L)

    assert(store.version("db.t").get == v0 + 1, "replaceWhere must be ONE commit")
    val after = dataFiles(root, "db", "t")
    // every file of partitions 0, 1, 3 carried over physically
    val untouched = before.filterNot(_._1.contains("par=2"))
    untouched.foreach { case (rel, mtime) =>
      assert(after.get(rel).contains(mtime), s"replaceWhere rewrote unrelated file $rel")
    }
    // region content is exactly the new batch
    assert(store.readWhere("db.t", col("par") === 2L).count() == 10)
    assert(store.read("db.t").count() == 750 + 10)
    assert(store.history("db.t").head._3 == "replace_where")
    store.detach()
  }

  test("overwriteWhere rejects incoming rows outside the region") {
    val (store, _) = freshStore()
    seed(store)
    val v0 = store.version("db.t").get
    val bad = spark.range(0, 5).select(
      col("id").as("k"), lit(3L).as("par"), lit(0.0).as("v"))
    // the violation raises from INSIDE the write job (single-pass
    // enforcement) — surfaced as a SparkException wrapping our message
    val e = intercept[Exception] {
      store.overwriteWhere("db.t", bad, col("par") === 2L)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("satisfy the predicate")), e.toString)
    assert(store.version("db.t").get == v0, "failed replace must not commit")
    store.detach()
  }

  test("overwritePartitions replaces exactly the partitions present in the batch") {
    val (store, root) = freshStore()
    seed(store)
    val before = dataFiles(root, "db", "t")
    val v0 = store.version("db.t").get

    // batch touches partition 1 (replaced smaller) and a NEW partition 9
    store.overwritePartitions("db.t",
      spark.range(0, 7).select(
        (col("id") * 4 + 1).as("k"), lit(1L).as("par"), lit(5.5).as("v"))
        .unionByName(spark.range(0, 3).select(
          (col("id") + 5000).as("k"), lit(9L).as("par"), lit(9.9).as("v"))))

    assert(store.version("db.t").get == v0 + 1)
    val after = dataFiles(root, "db", "t")
    val untouched = before.filterNot(_._1.contains("par=1"))
    untouched.foreach { case (rel, mtime) =>
      assert(after.get(rel).contains(mtime), s"dynamic overwrite rewrote unrelated file $rel")
    }
    assert(store.readWhere("db.t", col("par") === 1L).count() == 7)
    assert(store.readWhere("db.t", col("par") === 9L).count() == 3)
    assert(store.readWhere("db.t", col("par") === 0L).count() == 250)
    // empty batch replaces nothing and does not commit
    store.overwritePartitions("db.t", store.read("db.t").filter(lit(false)))
    assert(store.version("db.t").get == v0 + 1)
    store.detach()
  }

  test("overwritePartitions requires a partitioned table") {
    val (store, _) = freshStore()
    store.createOrReplace("db.flat", spark.range(0, 10).select(col("id").as("k")))
    val e = intercept[IllegalArgumentException] {
      store.overwritePartitions("db.flat", spark.range(0, 2).select(col("id").as("k")))
    }
    assert(e.getMessage.contains("not partitioned"))
    store.detach()
  }

  test("replaceWhere records delete+insert change images in the CDF") {
    val (store, _) = freshStore()
    seed(store)
    store.enableChangeFeed("db.t")
    val v0 = store.version("db.t").get
    store.overwriteWhere("db.t",
      spark.range(0, 4).select(
        (col("id") * 4 + 2).as("k"), lit(2L).as("par"), lit(-1.0).as("v")),
      col("par") === 2L)
    val feed = store.changeFeed("db.t", v0, v0 + 1)
    val byType = feed.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("delete") == 250, s"expected 250 delete images, got $byType")
    assert(byType("insert") == 4, s"expected 4 insert images, got $byType")
    store.detach()
  }

  test("SQL INSERT OVERWRITE PARTITION: static spec replaces one partition") {
    val (store, root) = freshStore()
    seed(store)
    val before = dataFiles(root, "db", "t")
    spark.range(0, 6).select((col("id") * 4 + 3).as("k"), (col("id") * 1.5).as("v"))
      .createOrReplaceTempView("rw_src")
    // static value is filled by the spec — the query carries k and v only
    spark.sql("INSERT OVERWRITE db.t PARTITION (par = 3) SELECT k, v FROM rw_src")
    val after = dataFiles(root, "db", "t")
    before.filterNot(_._1.contains("par=3")).foreach { case (rel, mtime) =>
      assert(after.get(rel).contains(mtime), s"static overwrite rewrote unrelated file $rel")
    }
    assert(store.readWhere("db.t", col("par") === 3L).count() == 6)
    assert(store.read("db.t").count() == 750 + 6)
    store.detach()
  }

  test("SQL INSERT OVERWRITE PARTITION: dynamic spec takes trailing query columns") {
    val (store, _) = freshStore()
    seed(store)
    // dynamic partition column comes LAST in the positional contract
    spark.range(0, 5).select(
      col("id").as("k"), (col("id") + 0.5).as("v"), lit(0L).as("par"))
      .createOrReplaceTempView("rw_dyn_src")
    spark.sql("INSERT OVERWRITE db.t PARTITION (par) SELECT k, v, par FROM rw_dyn_src")
    assert(store.readWhere("db.t", col("par") === 0L).count() == 5)
    assert(store.readWhere("db.t", col("par") === 1L).count() == 250)
    store.detach()
  }

  test("SQL INSERT INTO PARTITION: static spec appends into the partition") {
    val (store, _) = freshStore()
    seed(store)
    spark.range(0, 2).select((col("id") + 7000).as("k"), lit(0.25).as("v"))
      .createOrReplaceTempView("rw_app_src")
    spark.sql("INSERT INTO db.t PARTITION (par = 1) SELECT k, v FROM rw_app_src")
    assert(store.readWhere("db.t", col("par") === 1L).count() == 252)
    assert(store.read("db.t").count() == 1002)
    store.detach()
  }

  test("PARTITION spec over a non-partition column is rejected") {
    val (store, _) = freshStore()
    seed(store)
    spark.range(0, 1).select(lit(0L).as("par"), lit(0.0).as("v"))
      .createOrReplaceTempView("rw_bad_src")
    val e = intercept[Exception] {
      spark.sql("INSERT OVERWRITE db.t PARTITION (k = 5) SELECT par, v FROM rw_bad_src")
    }
    assert(e.getMessage.contains("not a partition column"), e.getMessage)
    store.detach()
  }
}
