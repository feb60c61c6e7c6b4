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

    val liCount = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val fact = store.read("gold.fact_sales")
    assert(fact.count() == liCount, "fact is line-item grain")
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
    val dataFiles = Files.list(
        java.nio.file.Paths.get(root, "db", "sorted", s"v_${store.versions("db.sorted").last}"))
      .toArray.map(_.toString).filter(_.endsWith(".parquet"))
    assert(dataFiles.nonEmpty)
    dataFiles.foreach { f =>
      val ks = spark.read.parquet(f).select($"k").as[Long].collect()
      assert(ks.sameElements(ks.sorted), s"file $f must be internally sorted")
    }
  }
}
