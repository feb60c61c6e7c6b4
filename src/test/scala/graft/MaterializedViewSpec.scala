package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tables.TableStore

/** Incrementally-maintained materialized views: refresh = the source's
  * change feed applied as signed per-group deltas through one file-pruned
  * MERGE. Every test compares the maintained view against a from-scratch
  * recompute — the definition of correct view maintenance — and pins
  * WHICH path ran (incremental merge vs pinned rebuild) via the manifest
  * op label, because the incremental path IS the 100 TB claim. */
class MaterializedViewSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)

  private def check(store: TableStore, mv: String, src: String): Unit = {
    val got = store.read(mv).select("g", "n", "total", "nv").orderBy("g").collect()
    val want = store.read(src).groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("total"), count("v").as("nv"))
      .orderBy("g").collect()
    assert(got.toSeq == want.toSeq,
      s"view diverged from recompute:\n got ${got.toSeq}\nwant ${want.toSeq}")
  }

  test("MV refresh applies mixed DML incrementally and matches recompute") {
    val root = Files.createTempDirectory("graft_mv").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    val df = spark.range(0, 1000).select(
      (col("id") % 7).as("g"), col("id").as("k"),
      when(col("id") % 13 === 0, lit(null)).otherwise(col("id")).cast("long").as("v"))
    store.createOrReplace("db.src", df)
    spark.sql("CREATE MATERIALIZED VIEW db.mv AS " +
      "SELECT g, count(*) AS n, sum(v) AS total, count(v) AS nv FROM db.src GROUP BY g")
    check(store, "db.mv", "db.src")

    store.delete("db.src", col("k") % 11 === 3)
    store.update("db.src", col("k") % 17 === 1, Map("v" -> (col("v") + 5L)))
    store.append("db.src",
      Seq((99L, 5000L, Option(7L)), (99L, 5001L, Option.empty[Long]))
        .toDF("g", "k", "v"))
    spark.sql("REFRESH MATERIALIZED VIEW db.mv")
    // the op label proves the INCREMENTAL path ran, not a rebuild
    assert(store.history("db.mv").head._3.startsWith("mv_refresh:"),
      s"expected incremental refresh, got op ${store.history("db.mv").head._3}")
    check(store, "db.mv", "db.src")

    // refresh with nothing new commits nothing
    val vs = store.versions("db.mv")
    store.refreshMaterializedView("db.mv")
    assert(store.versions("db.mv") == vs, "no-op refresh committed a version")

    // a group whose last row leaves is DELETED, not left at zero
    store.delete("db.src", col("g") === 99L)
    store.refreshMaterializedView("db.mv")
    assert(store.read("db.mv").filter(col("g") === 99L).count() == 0)
    check(store, "db.mv", "db.src")
    store.detach()
  }

  test("MV keeps SQL sum-NULL semantics under deltas") {
    val root = Files.createTempDirectory("graft_mv_null").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    // group 5 has ONLY null v values: its sum must be NULL and stay NULL
    // as rows come and go (the non-null counter, not coalesce-to-zero)
    val df = Seq((5L, 1L, Option.empty[Long]), (5L, 2L, Option.empty[Long]),
      (6L, 3L, Option(10L))).toDF("g", "k", "v")
    store.createOrReplace("db.srcn", df)
    store.createMaterializedView("db.mvn", "db.srcn", Seq("g"),
      Seq(("n", "count", "*"), ("total", "sum", "v"), ("nv", "count", "v")))
    store.append("db.srcn", Seq((5L, 4L, Option.empty[Long])).toDF("g", "k", "v"))
    store.refreshMaterializedView("db.mvn")
    val g5 = store.read("db.mvn").filter(col("g") === 5L)
      .select("n", "total", "nv").head()
    assert(g5.getLong(0) == 3 && g5.isNullAt(1) && g5.getLong(2) == 0,
      s"all-null group maintained wrong: $g5")
    // a non-null value arriving flips the sum from NULL
    store.append("db.srcn", Seq((5L, 5L, Option(42L))).toDF("g", "k", "v"))
    store.refreshMaterializedView("db.mvn")
    assert(store.read("db.mvn").filter(col("g") === 5L).select("total")
      .head().getLong(0) == 42L)
    assert(store.history("db.mvn").head._3.startsWith("mv_refresh:"))
    store.detach()
  }

  test("MV falls back to a pinned rebuild on NULL group keys and feed gaps") {
    val root = Files.createTempDirectory("graft_mv_fb").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    val df = Seq((Option(1L), 10L), (Option(2L), 20L)).toDF("g", "v")
      .withColumn("k", col("v"))
    store.createOrReplace("db.srcf", df)
    store.createMaterializedView("db.mvf", "db.srcf", Seq("g"),
      Seq(("n", "count", "*"), ("total", "sum", "v"), ("nv", "count", "v")))
    // a NULL group key arrives: MERGE key equality can't address it —
    // the refresh must rebuild, and the NULL group must be present
    store.append("db.srcf",
      Seq((Option.empty[Long], 30L)).toDF("g", "v").withColumn("k", col("v")))
    store.refreshMaterializedView("db.mvf")
    assert(!store.history("db.mvf").head._3.startsWith("mv_refresh:"),
      "NULL group key must route through the rebuild path")
    check(store, "db.mvf", "db.srcf")

    // vacuum the source past the feed window: refresh rebuilds, still right
    store.delete("db.srcf", col("v") === 30L) // removes the null-key group
    store.refreshMaterializedView("db.mvf")
    store.append("db.srcf", Seq((Option(3L), 40L)).toDF("g", "v")
      .withColumn("k", col("v")))
    store.vacuum("db.srcf")
    store.append("db.srcf", Seq((Option(3L), 41L)).toDF("g", "v")
      .withColumn("k", col("v")))
    store.refreshMaterializedView("db.mvf")
    check(store, "db.mvf", "db.srcf")
    store.detach()
  }

  test("a streaming pipeline keeps the MV fresh: foreachBatch refresh per commit") {
    val root = Files.createTempDirectory("graft_mv_stream").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    store.createOrReplace("db.srcs",
      Seq((1L, 10L), (2L, 20L)).toDF("g", "v").withColumn("k", col("v")))
    store.createMaterializedView("db.mvs", "db.srcs", Seq("g"),
      Seq(("n", "count", "*"), ("total", "sum", "v"), ("nv", "count", "v")))
    store.append("db.srcs",
      Seq((1L, 11L), (3L, 30L)).toDF("g", "v").withColumn("k", col("v")))
    store.append("db.srcs",
      Seq((2L, 21L)).toDF("g", "v").withColumn("k", col("v")))
    // the graft-table source drives one incremental refresh per commit —
    // the continuous-MV composition (DLT shape): source commits → stream
    // batches → signed-delta merges; refresh is idempotent per version,
    // so replays are no-ops
    val ckpt = Files.createTempDirectory("graft_mv_ck").toString
    val q = spark.readStream.format("graft-table")
      .option("root", root).option("table", "db.srcs").load()
      .writeStream
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        store.refreshMaterializedView("db.mvs"); () }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    check(store, "db.mvs", "db.srcs")
    assert(store.history("db.mvs").head._3.startsWith("mv_refresh:"))
    store.detach()
  }

  test("unsupported MV shapes are rejected with the reason") {
    val root = Files.createTempDirectory("graft_mv_rej").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    store.createOrReplace("db.srcr", Seq((1L, 2L)).toDF("g", "v"))
    val e1 = intercept[IllegalArgumentException] {
      spark.sql("CREATE MATERIALIZED VIEW db.bad AS " +
        "SELECT g, max(v) AS m FROM db.srcr GROUP BY g")
    }
    assert(e1.getMessage.contains("not incrementally maintainable"))
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("CREATE MATERIALIZED VIEW db.bad AS SELECT g, v FROM db.srcr")
    }
    assert(e2.getMessage.contains("GROUP BY"))
    store.detach()
  }
}
