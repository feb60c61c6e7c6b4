package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd
import graft.pipeline.Medallion
import graft.tables.TableStore

/** End-to-end medallion run at sf0.001 (the t1 smoke shape): bronze ingest,
  * SCD2 silver, gold dims with -9 seeds, star-join fact; plus the table
  * store's snapshot-swap / update / delete semantics. */
class PipelineSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  private val sfDir = "/root/testdata/sf0.001"

  test("medallion pipeline runs end-to-end and is idempotent on replay") {
    val root = Files.createTempDirectory("graft_store").toString
    val store = new TableStore(spark, root)
    val pipe = new Medallion(spark, store, sfDir)
    pipe.run(lit("2024-01-01 00:00:00"))

    // silver enforces one row per natural key (the synthetic lineitem has
    // duplicate PKs; see Medallion.runSilver), so the fact grain is the
    // DISTINCT key count, not the raw row count
    val liKeys = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber").distinct().count()
    val fact = store.read("gold.fact_sales")
    assert(fact.count() == liKeys, "fact is line-item grain (PK-deduped silver)")
    assert(fact.filter(col("_tf_dim_customer_id") === -9L).count() >= 0)
    assert(store.read("gold.dim_customer").filter(col("customer_key") === -9L).count() == 1,
      "unknown member seeded")
    assert(store.read("gold.dim_calendar").count() > 10000, "30y calendar")
    // every fact row resolves its calendar key or is unknown
    val badKeys = fact.join(
      store.read("gold.dim_calendar").select(col("date_key")),
      fact("_tf_dim_calendar_id") === col("date_key"), "left_anti")
      .filter(col("_tf_dim_calendar_id") =!= -9)
    assert(badKeys.count() == 0, "all smart keys resolve in dim_calendar")

    // replay with same data at a later ts: SCD2 closes nothing, fact unchanged
    pipe.runSilver(lit("2024-02-01 00:00:00"))
    val closed = store.read("silver.customer").filter(col(Scd.ValidTo).isNotNull)
    assert(closed.count() == 0, "idempotent replay closes no versions")
    store.detach()
  }

  test("transactional medallion run: crash mid-run leaves every table at pre-run state; " +
      "a completed run matches the per-stage pipeline") {
    val root = Files.createTempDirectory("graft_txnrun").toString
    val store = new TableStore(spark, root)
    val pipe = new Medallion(spark, store, sfDir)
    val ts1 = lit("2024-01-01 00:00:00"); val ts2 = lit("2024-02-01 00:00:00")
    try {
      // first transactional load publishes the whole star at once
      pipe.runTransactional(ts1)
      val factRows = store.read("gold.fact_sales").count()
      assert(factRows > 0 && store.read("gold.dim_customer").count() > 0)
      val verBefore = Seq("bronze.lineitem", "silver.lineitem",
        "gold.dim_customer", "gold.fact_sales").map(t => t -> store.version(t)).toMap
      // a run crashing AFTER silver staged (gold never staged) must be
      // invisible: no version moves, no table readable mid-state
      pipe.crashAfterStageForTest = Some("silver")
      val e = intercept[Exception] { pipe.runTransactional(ts2) }
      assert(e.getMessage.contains("simulated crash"), s"got $e")
      pipe.crashAfterStageForTest = None
      verBefore.foreach { case (t, v) =>
        assert(store.version(t) == v, s"$t moved after an aborted run") }
      assert(store.read("gold.fact_sales").count() == factRows)
      // and no staged version directories leak from the abort
      // (the txn drops them; a second run succeeding proves the store
      // is clean)
      pipe.runTransactional(ts2)
      assert(store.read("gold.fact_sales").count() == factRows,
        "identical data replay keeps the fact grain")
      // the transactional pipeline's published star equals the per-stage
      // pipeline's on the same inputs
      val root2 = Files.createTempDirectory("graft_stagedrun").toString
      val store2 = new TableStore(spark, root2)
      try {
        val pipe2 = new Medallion(spark, store2, sfDir)
        pipe2.run(ts1)
        pipe2.run(ts2)
        for (t <- Seq("gold.fact_sales", "gold.dim_customer", "gold.dim_geography",
            "silver.lineitem", "silver.customer")) {
          val a = store.read(t); val b = store2.read(t)
          assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
            s"$t differs between transactional and per-stage runs")
        }
      } finally {
        store2.detach()
        graft.queries.Scratch.deleteRecursively(java.nio.file.Paths.get(root2))
      }
    } finally {
      store.detach()
      graft.queries.Scratch.deleteRecursively(java.nio.file.Paths.get(root))
    }
  }

  test("incremental gold fact load: SCD1 merge rewrites only changed-grain files") {
    val root = Files.createTempDirectory("graft_factinc").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    val pipe = new Medallion(spark, store, sfDir)
    val ts1 = lit("2024-01-01 00:00:00"); val ts2 = lit("2024-01-02 00:00:00")
    pipe.run(ts1)
    // lay the fact out as grain-clustered files (at sf0.001 the initial
    // write is a single file — at scale the layout job does this), so the
    // file-pruning claim is actually observable
    store.compact("gold.fact_sales", targetFiles = 6, zorderBy = Seq("sales_order_key"))
    val factBefore = store.prunedFileList("gold.fact_sales", None).toSet
    assert(factBefore.size >= 4, s"need a multi-file fact (${factBefore.size})")
    val rowsBefore = store.read("gold.fact_sales").count()

    // mutate ONE bronze line (a singleton grain key, so the silver PK
    // dedup keeps the same survivor) and replay the pipeline's day-2 loads
    val k = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy($"l_orderkey", $"l_linenumber").count().filter($"count" === 1)
      .orderBy($"l_orderkey", $"l_linenumber")
      .select($"l_orderkey", $"l_linenumber").as[(Long, Long)].head()
    store.update("bronze.lineitem",
      col("l_orderkey") === k._1 && col("l_linenumber") === k._2,
      Map("l_quantity" -> lit(999.0)))
    pipe.runSilver(ts2); pipe.runGoldDims(ts2); pipe.runGoldFact(ts2)

    val factAfter = store.prunedFileList("gold.fact_sales", None).toSet
    assert(rowsBefore == store.read("gold.fact_sales").count(), "grain count stable")
    val carried = factBefore.intersect(factAfter)
    assert(carried.nonEmpty && carried.size >= factBefore.size - 2,
      s"incremental fact load rewrote unchanged files (${carried.size}/${factBefore.size})")
    val row = store.read("gold.fact_sales")
      .filter(col("sales_order_key") === k._1 && col("sales_line_number") === k._2)
      .select(col("sales_qty").cast("double"), col(graft.operators.Scd.UpdateDate).cast("string"),
        col(graft.operators.Scd.CreateDate).cast("string"))
      .as[(Double, String, String)].head()
    assert(row._1 == 999.0, "changed measure merged through")
    assert(row._2.startsWith("2024-01-02"), "update audit bumped")
    assert(row._3.startsWith("2024-01-01"), "create audit preserved on update")
    // day-3 replay with no bronze change: fact files untouched
    pipe.runSilver(ts2); pipe.runGoldDims(ts2)
    val pre = store.prunedFileList("gold.fact_sales", None).toSet
    pipe.runGoldFact(lit("2024-01-03 00:00:00"))
    assert(store.prunedFileList("gold.fact_sales", None).toSet == pre,
      "no-change fact load must be a zero-file no-op")
    store.detach()
  }

  test("informational FOREIGN KEY: round-trip, guards, orphan scan, DESCRIBE DETAIL") {
    val root = Files.createTempDirectory("graft_fk").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    store.createOrReplace("gold.dim", Seq((1L, "a"), (2L, "b")).toDF("dim_id", "nm"))
    store.createOrReplace("gold.fact",
      Seq((10L, Some(1L)), (11L, Some(2L)), (12L, Some(2L)), (13L, Some(9L)),
        (14L, Option.empty[Long])).toDF("fact_id", "dim_fk"))

    store.setForeignKey("gold.fact", "fk_dim", Seq("dim_fk"), "gold.dim", Seq("dim_id"))
    assert(store.foreignKeys("gold.fact") ==
      Map("fk_dim" -> ((Seq("dim_fk"), "gold.dim", Seq("dim_id")))))
    assert(store.detail("gold.fact")("foreign_keys") ==
      "fk_dim: (dim_fk) REFERENCES gold.dim(dim_id)")
    // orphan scan: key 9 has no parent; the NULL key is not an orphan
    assert(store.fkOrphans("gold.fact", "fk_dim") == 1L)
    // the child column is rename/drop-protected while referenced
    intercept[IllegalArgumentException] { store.renameColumn("gold.fact", "dim_fk", "x") }
    intercept[IllegalArgumentException] { store.dropColumn("gold.fact", "dim_fk") }
    // declaration against missing columns/tables refuses
    intercept[IllegalArgumentException] {
      store.setForeignKey("gold.fact", "bad", Seq("nope"), "gold.dim", Seq("dim_id")) }
    intercept[IllegalArgumentException] {
      store.setForeignKey("gold.fact", "bad", Seq("dim_fk"), "gold.nope", Seq("dim_id")) }
    store.dropForeignKey("gold.fact", "fk_dim")
    assert(store.foreignKeys("gold.fact").isEmpty)
    store.renameColumn("gold.fact", "dim_fk", "x") // now allowed

    // the medallion declares the reference's star topology on its fact
    val pipe = new graft.pipeline.Medallion(spark, store, sfDir)
    pipe.run(lit("2024-01-01 00:00:00"))
    assert(store.foreignKeys("gold.fact_sales").keySet ==
      Set("fk_calendar", "fk_customer", "fk_geography"))
    // -9 unknown members make every FK resolvable: zero orphans by design
    assert(store.fkOrphans("gold.fact_sales", "fk_customer") == 0L)
    store.detach()
  }

  test("incremental silver load is a file-pruned merge: untouched files stay in place") {
    val root = Files.createTempDirectory("graft_silver_inc").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    // initial silver snapshot spread over several files
    val base = spark.range(0, 2000)
      .select(col("id").as("k"), (col("id") % 7).as("grp"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(6, col("k"))
    Scd.scd2ApplyBatch(store, "silver.inc", base, Seq("k"), lit("2024-01-01 00:00:00"),
      initAudit = true)
    val before = store.prunedFileList("silver.inc", None).toSet

    // day-2 snapshot: 3 changed rows in one key band, everything else identical
    val day2 = base.withColumn("v",
      when(col("k").isin(10L, 11L, 12L), lit("changed")).otherwise(col("v")))
    Scd.scd2ApplyBatch(store, "silver.inc", day2, Seq("k"), lit("2024-01-02 00:00:00"))

    val after = store.prunedFileList("silver.inc", None).toSet
    val carried = before.intersect(after)
    assert(carried.nonEmpty && carried.size >= before.size - 2,
      s"snapshot SCD2 load rewrote unchanged files (${carried.size}/${before.size} carried)")
    // semantics: 3 closed versions, 3 new current rows, history intact
    val t = store.read("silver.inc")
    assert(t.filter(col(Scd.ValidTo).isNotNull).count() == 3)
    assert(t.filter(col(Scd.ValidTo).isNull).count() == 2000)
    assert(t.filter(col("v") === "changed" && col(Scd.ValidTo).isNull).count() == 3)
    // day-3 replay of the identical snapshot: nothing rewritten at all
    val preReplay = store.prunedFileList("silver.inc", None).toSet
    Scd.scd2ApplyBatch(store, "silver.inc", day2, Seq("k"), lit("2024-01-03 00:00:00"))
    assert(store.prunedFileList("silver.inc", None).toSet == preReplay,
      "idempotent replay must be a zero-file no-op")
    store.detach()
  }

  test("file-pruned UPDATE/DELETE: only files holding matching rows are rewritten") {
    val root = Files.createTempDirectory("graft_cow").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    val df = spark.range(0, 1000)
      .select((col("id") % 4).as("region"), col("id").as("k"),
        concat(lit("v"), col("id")).as("v"))
    store.createOrReplace("db.parted", df, partitionBy = Seq("region"))
    val before = store.prunedFileList("db.parted", None).toSet
    assert(before.size >= 4, "one file per partition value at least")

    // update confined to one partition: every other partition's files must
    // survive into the new manifest BY PATH — untouched, not rewritten
    store.update("db.parted", col("region") === 2L, Map("v" -> lit("UPD")))
    val after = store.prunedFileList("db.parted", None).toSet
    val untouchedBefore = before.filter(!_.contains("__p_region=2"))
    assert(untouchedBefore.subsetOf(after),
      s"untouched partitions must carry over by path:\n$before\nvs\n$after")
    assert(after.intersect(before.filter(_.contains("__p_region=2"))).isEmpty,
      "touched partition files must be replaced")
    assert(store.read("db.parted").filter($"v" === "UPD").count() == 250)
    assert(store.read("db.parted").count() == 1000)

    // delete likewise: only region=3 files rewritten (here: dropped)
    val preDelete = store.prunedFileList("db.parted", None).toSet
    store.delete("db.parted", col("region") === 3L)
    val postDelete = store.prunedFileList("db.parted", None).toSet
    assert(preDelete.filter(!_.contains("__p_region=3")).subsetOf(postDelete))
    assert(store.read("db.parted").count() == 750)

    // no-match DML is a metadata no-op: no new version committed
    val vBefore = store.versions("db.parted").last
    store.update("db.parted", col("region") === 99L, Map("v" -> lit("X")))
    assert(store.versions("db.parted").last == vBefore, "no-op commits nothing")
    store.detach()
  }

  test("insert-only MERGE appends new files and rewrites none (SCD2 phase-2 shape)") {
    val root = Files.createTempDirectory("graft_cow2").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    store.createOrReplace("db.m",
      Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val before = store.prunedFileList("db.m", None).toSet
    store.merge("db.m", Seq((2, "B"), (3, "c")).toDF("k", "v"), Seq("k"),
      notMatched = Seq(graft.operators.MergeInto.NotMatchedInsert(None,
        Map("k" -> col("s.k"), "v" -> col("s.v")))))
    val after = store.prunedFileList("db.m", None).toSet
    assert(before.subsetOf(after), "insert-only merge must not rewrite existing files")
    assert(store.read("db.m").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b"), (3, "c")), "matched source rows do not insert")

    // a matched-update merge rewrites only the files holding matched rows
    val pre = store.prunedFileList("db.m", None).toSet
    store.merge("db.m", Seq((1, "A")).toDF("k", "v"), Seq("k"),
      matched = Seq(graft.operators.MergeInto.MatchedUpdate(None, Map("v" -> col("s.v")))))
    val post = store.prunedFileList("db.m", None).toSet
    assert(pre.intersect(post).nonEmpty, "files without matched rows carry over")
    assert(store.read("db.m").as[(Int, String)].collect().toSet ==
      Set((1, "A"), (2, "b"), (3, "c")))
    store.detach()
  }

  test("restore re-points an old manifest; shallow clone forks zero-copy and diverges safely") {
    val root = Files.createTempDirectory("graft_restore").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    store.createOrReplace("db.r", Seq((1, "a"), (2, "b")).toDF("k", "v"))   // v1
    store.delete("db.r", col("k") === 2)                                    // v2
    assert(store.read("db.r").count() == 1)
    store.restore("db.r", 1)                                                // v3 = v1's content
    assert(store.read("db.r").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")), "restore brings the deleted row back")
    assert(store.version("db.r").get == 3, "restore is a fresh commit, history preserved")

    // shallow clone: instant fork referencing the source's files
    store.cloneTo("db.r", "db.rclone")
    assert(store.read("db.rclone").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")))
    // clone DML rewrites only clone-local state — the source never moves
    val srcVersion = store.version("db.r").get
    store.update("db.rclone", col("k") === 1, Map("v" -> lit("CLONE")))
    assert(store.version("db.r").get == srcVersion, "source version untouched")
    assert(store.read("db.r").filter($"v" === "CLONE").count() == 0,
      "source rows untouched by clone DML")
    assert(store.read("db.rclone").filter($"v" === "CLONE").count() == 1)
    // vacuuming the clone never reaches outside its own directory
    store.vacuum("db.rclone")
    assert(store.read("db.r").count() == 2, "source files survive clone vacuum")
    assert(store.read("db.rclone").count() == 2)
    store.detach()
  }

  test("change feed: updates appear as delete+insert pairs; untouched partitions cancel") {
    val root = Files.createTempDirectory("graft_cdf").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    val df = spark.range(0, 400)
      .select((col("id") % 4).as("region"), col("id").as("k"), lit("old").as("v"))
    store.createOrReplace("db.cdf", df, partitionBy = Seq("region"))
    val v0 = store.version("db.cdf").get
    store.update("db.cdf", col("region") === 2L && col("k") < 100L, Map("v" -> lit("new")))
    val changes = store.changesBetween("db.cdf", v0, store.version("db.cdf").get)
    val byType = changes.groupBy($"_change_type").count()
      .as[(String, Long)].collect().toMap
    // 25 rows match (k<100 ∧ region=2): each update = one delete + one insert
    assert(byType == Map("insert" -> 25L, "delete" -> 25L), s"got $byType")
    assert(changes.filter($"region" =!= 2L).count() == 0,
      "rows of untouched partitions cancel out of the diff")
    assert(changes.filter($"_change_type" === "insert" && $"v" =!= "new").count() == 0)
    store.detach()
  }

  test("compaction folds append-accumulated small files; stats and rows survive") {
    val root = Files.createTempDirectory("graft_compact").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    store.createOrReplace("db.appends", Seq((1, "a")).toDF("k", "v"), sortWithin = Seq("k"))
    // three insert-only merges = three file appends (the streaming-ingest shape)
    (2 to 4).foreach { i =>
      store.merge("db.appends", Seq((i, "x")).toDF("k", "v"), Seq("k"),
        notMatched = Seq(graft.operators.MergeInto.NotMatchedInsert(None,
          Map("k" -> org.apache.spark.sql.functions.col("s.k"),
            "v" -> org.apache.spark.sql.functions.col("s.v")))))
    }
    val before = store.prunedFileList("db.appends", None)
    assert(before.size >= 4, s"appends accumulate files: $before")
    store.compact("db.appends")
    val after = store.prunedFileList("db.appends", None)
    assert(after.size == 1, s"compacted to one file: $after")
    assert(store.read("db.appends").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "x"), (3, "x"), (4, "x")))
    assert(store.prunedFileList("db.appends", Some($"k" === 99)).isEmpty
      || store.prunedFileList("db.appends", Some($"k" === 99)).size <= after.size,
      "stats still collected on the compacted file")
    store.detach()
  }

  test("optimistic concurrency: a stale writer's commit raises instead of clobbering") {
    val root = Files.createTempDirectory("graft_cas").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    store.createOrReplace("db.cc", Seq((1, 10)).toDF("k", "n"))
    val base = store.version("db.cc").get
    // another writer lands an update after this writer read its snapshot
    store.update("db.cc", col("k") === 1, Map("n" -> lit(11)))
    val e = intercept[java.util.ConcurrentModificationException] {
      store.replaceIfUnchanged("db.cc", Seq((1, 99)).toDF("k", "n"), base)
    }
    assert(e.getMessage.contains("moved from version"))
    assert(store.read("db.cc").as[(Int, Int)].head() == ((1, 11)),
      "the concurrent writer's update survives")
    // the losing writer's aborted commit must NOT surface as a committed
    // version: versions()/history/time travel all treat manifest existence
    // as committed, so a surviving phantom manifest would make the
    // uncommitted (1, 99) data readable via VERSION/TIMESTAMP AS OF
    assert(store.versions("db.cc") == Seq(1, 2),
      s"aborted commit left a phantom version: ${store.versions("db.cc")}")
    assert(store.readVersion("db.cc", store.versions("db.cc").max)
      .as[(Int, Int)].head() == ((1, 11)),
      "newest retained version is the winning writer's commit")
    // retry from the current version succeeds
    store.replaceIfUnchanged("db.cc", Seq((1, 99)).toDF("k", "n"),
      store.version("db.cc").get)
    assert(store.read("db.cc").as[(Int, Int)].head() == ((1, 99)))
    store.detach()
  }

  test("string stats prune under UTF-8 byte order; non-finite doubles don't break commits") {
    val root = Files.createTempDirectory("graft_stats_edge").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    // U+E000 (private use, BMP) sorts ABOVE U+1F600 (emoji, supplementary)
    // in UTF-16 code units but BELOW it in UTF-8 bytes — parquet stats use
    // unsigned UTF-8 order, so comparing them UTF-16 would wrongly prune
    // the file for an equality on the emoji
    val bmpHigh = "x"
    val emoji = new String(Character.toChars(0x1F600)) + "x"
    store.createOrReplace("db.uni",
      Seq((1, bmpHigh), (2, emoji), (3, "plain")).toDF("k", "s"),
      sortWithin = Seq("s"), statsFor = Seq("s"))
    assert(store.readWhere("db.uni", $"s" === emoji).count() == 1,
      "supplementary-code-point equality must not be pruned away")
    assert(store.readWhere("db.uni", $"s" === bmpHigh).count() == 1)
    assert(store.readWhere("db.uni", $"s" === "plain").count() == 1)

    // Infinity/NaN in a stats column: the footer read must skip the value
    // (no stats for that column) instead of crashing the commit after the
    // data files are written
    store.createOrReplace("db.inf",
      Seq((1, Double.PositiveInfinity), (2, 1.5), (3, Double.NaN)).toDF("k", "d"),
      sortWithin = Seq("d"), statsFor = Seq("d"))
    assert(store.read("db.inf").count() == 3)
    assert(store.readWhere("db.inf", $"d" === 1.5).count() == 1,
      "reads over a stats-less column stay conservative, not empty")
    store.detach()
  }

  test("per-file min/max stats skip files on key-range reads of the sorted fact shape") {
    val root = Files.createTempDirectory("graft_skip").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    // sorted-within-file write over a pre-range-partitioned frame: each
    // file covers a disjoint key range, like the medallion fact table
    val df = spark.range(0, 100000).select(col("id").as("k"), (col("id") * 7).as("v"))
      .repartitionByRange(8, col("k"))
    store.createOrReplace("db.fact", df, sortWithin = Seq("k"))
    val all = store.prunedFileList("db.fact", None)
    val pruned = store.prunedFileList("db.fact", Some($"k" >= 20000L && $"k" < 30000L))
    assert(all.size >= 8)
    assert(pruned.size < all.size / 2,
      s"range read must skip most files: ${pruned.size} of ${all.size}")
    // pruning is exact: same rows as the unpruned filtered read
    val viaSkip = store.readWhere("db.fact", $"k" >= 20000L && $"k" < 30000L)
    assert(viaSkip.count() == 10000)
    assert(viaSkip.agg(sum($"v")).as[Long].head ==
      store.read("db.fact").filter($"k" >= 20000L && $"k" < 30000L)
        .agg(sum($"v")).as[Long].head)
    store.detach()
  }

  test("table store: update/delete rewrite and snapshot swap") {
    val root = Files.createTempDirectory("graft_store2").toString
    val store = new TableStore(spark, root)
    import spark.implicits._
    // K2: declare-empty then load
    store.createEmpty("db.t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    assert(store.read("db.t").count() == 0 && store.read("db.t").columns.toSeq == Seq("k", "v"))
    store.createOrReplace("db.t", Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
    store.update("db.t", col("k") === 2, Map("v" -> lit("B")))
    store.delete("db.t", col("k") === 3)
    val rows = store.read("db.t").as[(Int, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1, "a"), (2, "B")))
    // time travel: pre-update/delete snapshots remain readable
    assert(store.versions("db.t").size == 4, "empty + load + update + delete")
    assert(store.readVersion("db.t", 2).count() == 3, "pre-delete snapshot intact")
    store.vacuum("db.t")
    assert(store.read("db.t").count() == 2, "vacuum keeps current version readable")
    assert(store.versions("db.t") == Seq(4), "vacuum drops non-current versions")

    // declarative metadata (comments, properties, PK) round-trips and
    // survives snapshot swaps, like the reference's COMMENT / ALTER TABLE
    // ADD PRIMARY KEY DDL (01_Init.py:58-77, 236-241)
    store.setMeta("db.t", graft.tables.TableMeta(
      comment = Some("test table"),
      columnComments = Map("k" -> "the key"),
      properties = Map("quality" -> "gold")))
    store.setPrimaryKey("db.t", Seq("k"))
    store.createOrReplace("db.t", Seq((9, "z")).toDF("k", "v")) // swap again
    val m = store.meta("db.t")
    assert(m.comment.contains("test table"))
    assert(m.columnComments == Map("k" -> "the key"))
    assert(m.properties == Map("quality" -> "gold", "primary_key" -> "k"))

    // sortWithin: every written file is internally sorted on the key, so
    // parquet row-group min/max stats are selective
    val shuffled = spark.range(0, 10000).select(
      (col("id") * 48271 % 10007).as("k"), col("id").as("v"))
    store.createOrReplace("db.sorted", shuffled, sortWithin = Seq("k"))
    val dataFiles = Files.walk(
        java.nio.file.Paths.get(root, "db", "sorted", s"v_${store.versions("db.sorted").last}"))
      .toArray.map(_.toString).filter(_.endsWith(".parquet"))
    assert(dataFiles.nonEmpty)
    dataFiles.foreach { f =>
      val ks = spark.read.parquet(f).select($"k").as[Long].collect()
      assert(ks.sameElements(ks.sorted), s"file $f must be internally sorted")
    }
    store.detach()
  }
}
