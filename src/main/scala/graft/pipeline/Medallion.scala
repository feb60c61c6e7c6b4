package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Calendar, Scd, SurrogateKeys}
import graft.sources.Tables
import graft.tables.TableStore

/** The reference's bronze → silver → gold medallion pipeline, re-expressed
  * over the testdata star schema (reference DAG:
  * finalize_databricks_deployment.py:383-431; stage logic:
  * 12_ETL_Bronze_PySpark.py, 22_ETL_Silver_PySpark.py,
  * 33_ETL_Gold_Dim_PySpark.py, 34_ETL_Gold_Fact_PySpark.py).
  * The four notebooks become four functions sequenced by [[run]]; the
  * Databricks job DAG collapses to a call chain (SURVEY.md §3.3).
  *
  * Table mapping (FIXTURES.md §B): orders/lineitem ≈ sales order
  * header/detail, customer ≈ customer, nation+region ≈ address/geography,
  * order dates drive dim_calendar smart keys.
  *
  * Scale notes: silver SCD2 merges shuffle on the natural key only; gold
  * fact assembly broadcasts every dimension (all small by star-schema
  * construction) so the fact table never shuffles at all — at 100 TB the
  * fact side stays partition-local from scan to write.
  */
final class Medallion(spark: SparkSession, store: TableStore, sfDir: String,
    bucketedFact: Boolean = false) {

  private val bronzeTables = Seq("region", "nation", "customer", "orders", "lineitem")

  // Independent table loads run as concurrent Spark jobs (the scheduler
  // interleaves their stages across executor slots) — the reference's
  // serial notebook loop leaves the cluster idle between small tables.
  private def inParallel(work: Seq[() => Unit]): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(work.map(w => Future(w()))), Duration.Inf)
  }

  /** Bronze: snapshot-overwrite ingest (reference 12:61-128, K1). */
  def runBronze(): Unit =
    inParallel(bronzeTables.map(n =>
      () => store.createOrReplace(s"bronze.$n", Tables.t(spark, sfDir, n))))

  /** Silver: SCD2 incremental load per table (reference 22), carrying the
    * reference's audit pair (01_Init.py:231-233). Each load is ONE
    * file-pruned store merge ([[Scd.scd2ApplyBatch]] — the same engine the
    * streaming SCD2 sink uses), not a snapshot rewrite: an incremental
    * load against a 100 TB history table rewrites only the files whose
    * current rows actually changed or vanished, and appends the rest.
    *
    * Cleansing contract: silver enforces ONE row per declared natural key.
    * The reference's OLTP source guarantees this upstream (SQL Server
    * primary keys); the synthetic feed does not (lineitem carries
    * duplicate (l_orderkey, l_linenumber) pairs), and SCD2 — like Delta
    * MERGE, which raises on multi-matched target rows — is undefined on a
    * non-unique key. The dedup is deterministic (row_number over the key,
    * ordered by every payload column) so replays and the DuckDB oracle
    * pick the same survivor. */
  private val silverSpecs = Seq(
    ("customer", Seq("c_custkey")),
    ("orders", Seq("o_orderkey")),
    ("lineitem", Seq("l_orderkey", "l_linenumber")),
    ("nation", Seq("n_nationkey")),
    ("region", Seq("r_regionkey")))

  /** Deterministic one-row-per-natural-key survivor pick (see the
    * cleansing contract above). */
  private def dedupKey(raw: DataFrame, keys: Seq[String]): DataFrame = {
    val payloadOrder = raw.columns.filterNot(keys.contains).map(col).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(payloadOrder: _*)
    raw.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  def runSilver(loadTs: Column): Unit =
    inParallel(silverSpecs.map { case (name, keys) => () =>
      Scd.scd2ApplyBatch(store, s"silver.$name",
        dedupKey(store.read(s"bronze.$name"), keys), keys, loadTs, initAudit = true)
    })

  private def current(name: String): DataFrame =
    // readWhere, not read().filter(): the IS NULL predicate reaches the
    // store's null-count file skipping, so closed-history silver files
    // are never opened for a current-slice read
    store.readWhere(name, col(Scd.ValidTo).isNull)

  private def withAudit(df: DataFrame, loadTs: Column): DataFrame =
    df.withColumn(Scd.CreateDate, loadTs.cast("timestamp"))
      .withColumn(Scd.UpdateDate, loadTs.cast("timestamp"))

  /** Gold dims: calendar CTAS + SCD1 dims with -9 unknown members
    * (reference 01:180-233 calendar; 33 dims; 01:265-321 seeds), all
    * carrying the audit pair like the reference tables. */
  def runGoldDims(loadTs: Column): Unit = {
    stageGoldDims(loadTs, current, store.createOrReplace(_, _))
    dimMetadata()
  }

  /** The dim builds, parameterized over where the silver current slice
    * comes from and where the dims land — the per-stage path passes the
    * store read/write, the transactional path the txn's staged forms. */
  private def stageGoldDims(loadTs: Column, cur: String => DataFrame,
      write: (String, DataFrame) => Unit): Unit = {
    // testdata order dates start in 1995, so the calendar range is widened
    // vs the reference's 2000-01-01 start (01_Init.py:188)
    write("gold.dim_calendar",
      withAudit(Calendar.build(spark, start = "1995-01-01"), loadTs))

    // dim_geography ≈ nation ⋈ region with N/A defaults (reference 33:44-57)
    val geoUnknown = spark.sql(
      "SELECT CAST(-9 AS BIGINT) AS _tf_dim_geography_id, CAST(-9 AS INT) AS nation_key, 'N/A' AS nation_name, 'N/A' AS region_name")
    val geo = cur("silver.nation").alias("n")
      .join(broadcast(cur("silver.region").alias("r")),
        col("n.n_regionkey") === col("r.r_regionkey"), "left_outer")
      .select(
        col("n.n_nationkey").as("nation_key"),
        coalesce(col("n.n_name").try_cast("string"), lit("N/A")).as("nation_name"),
        coalesce(col("r.r_name").try_cast("string"), lit("N/A")).as("region_name"))
    write("gold.dim_geography",
      withAudit(geoUnknown.unionByName(
        SurrogateKeys.assignOrdered(geo, "_tf_dim_geography_id", Seq(col("nation_key")))), loadTs))

    // dim_customer (reference 33:108-125)
    val custUnknown = spark.sql(
      "SELECT CAST(-9 AS BIGINT) AS _tf_dim_customer_id, CAST(-9 AS BIGINT) AS customer_key, 'N/A' AS customer_name, 'N/A' AS mktsegment, CAST(-9 AS INT) AS nation_key")
    val cust = cur("silver.customer").select(
      col("c_custkey").as("customer_key"),
      coalesce(col("c_name").try_cast("string"), lit("N/A")).as("customer_name"),
      coalesce(col("c_mktsegment").try_cast("string"), lit("N/A")).as("mktsegment"),
      col("c_nationkey").as("nation_key"))
    write("gold.dim_customer",
      withAudit(custUnknown.unionByName(
        SurrogateKeys.assignOrdered(cust, "_tf_dim_customer_id", Seq(col("customer_key")))), loadTs))
  }

  /** Declarative metadata like the reference's COMMENT + ADD PRIMARY KEY
    * DDL (01_Init.py:196-197, 236-241) — recorded, not enforced. The
    * sidecars are unversioned, so the transactional path applies them
    * after the publish. */
  private def dimMetadata(): Unit = {
    store.setMeta("gold.dim_calendar", graft.tables.TableMeta(
      comment = Some("Calendar dimension, one row per day"),
      columnComments = Map("date_key" -> "smart key 10000*Y + 100*M + D")))
    store.setPrimaryKey("gold.dim_calendar", Seq("date_key"))
  }

  /** Bucket count for the co-located header/detail join — sized to the
    * local harness; on a real cluster this is the executor-scale knob
    * (hundreds/thousands of buckets). */
  private val factBuckets = 8

  /** Gold fact: star-join assembly at line grain with smart date key and -9
    * FK defaults (reference 34:44-83).
    *
    * In `bucketedFact` mode the two fact-side tables are first published as
    * CURRENT-slice catalog tables bucketed+sorted on the order key, so the
    * header/detail join — the only at-scale shuffle in the whole assembly —
    * runs with ZERO exchanges (scan → sort-merge join over co-located
    * buckets), and every OTHER consumer joining on the order key gets the
    * same property for free: the shuffle is paid once at publish time, not
    * per downstream join. With a single consumer (this benchmark pipeline)
    * the publish costs more than the one join it saves, so the mode is an
    * explicit choice, exactly like bucketing a real warehouse table.
    * Pre-filtering orders to its current slice is equivalent to the
    * reference's null-test inside the left-join condition (SURVEY §2.4 J1:
    * a left join row can only match a current header). Dimensions stay
    * broadcast. PlanSpec pins the no-Exchange property mechanically on
    * this exact build path. */
  private[graft] def buildFact(loadTs: Column,
      cur: String => DataFrame = current,
      dims: String => DataFrame = n => store.read(n)): DataFrame = {
    val (li, o) =
      if (bucketedFact) {
        spark.sql("CREATE DATABASE IF NOT EXISTS silver_cur")
        graft.tables.Bucketing.writeBucketed(
          cur("silver.lineitem"), "silver_cur.lineitem", "l_orderkey", factBuckets)
        graft.tables.Bucketing.writeBucketed(
          cur("silver.orders"), "silver_cur.orders", "o_orderkey", factBuckets)
        (spark.table("silver_cur.lineitem").alias("li"),
          spark.table("silver_cur.orders").alias("o"))
      } else
        (cur("silver.lineitem").alias("li"),
          cur("silver.orders").alias("o"))
    val dc = dims("gold.dim_customer").alias("dc")
    val dg = dims("gold.dim_geography").alias("dg")
    li
      .join(o, col("li.l_orderkey") === col("o.o_orderkey"), "left_outer")
      .join(broadcast(dc), col("o.o_custkey") === col("dc.customer_key"), "left_outer")
      .join(broadcast(dg), col("dc.nation_key") === col("dg.nation_key"), "left_outer")
      .select(
        col("li.l_orderkey").as("sales_order_key"),
        col("li.l_linenumber").as("sales_line_number"),
        coalesce(
          (year(col("o.o_orderdate")) * 10000 + month(col("o.o_orderdate")) * 100 +
            dayofmonth(col("o.o_orderdate"))).cast("int"),
          lit(-9)).as("_tf_dim_calendar_id"),
        coalesce(col("dc._tf_dim_customer_id"), lit(-9L)).as("_tf_dim_customer_id"),
        coalesce(col("dg._tf_dim_geography_id"), lit(-9L)).as("_tf_dim_geography_id"),
        coalesce(col("li.l_quantity"), lit(0.0)).cast("decimal(19,4)").as("sales_qty"),
        coalesce(col("li.l_extendedprice"), lit(0.0)).cast("decimal(19,4)").as("sales_extended_price"),
        coalesce(col("li.l_discount"), lit(0.0)).cast("decimal(19,4)").as("sales_discount"),
        (coalesce(col("li.l_extendedprice"), lit(0.0)) * (lit(1.0) - coalesce(col("li.l_discount"), lit(0.0))))
          .cast("decimal(38,6)").as("sales_net_price"))
  }

  def runGoldFact(loadTs: Column): Unit = {
    stageGoldFact(loadTs, txn = None)
    factMetadata()
  }

  private def stageGoldFact(loadTs: Column,
      txn: Option[graft.tables.Txn],
      cur: String => DataFrame = current,
      dims: String => DataFrame = n => store.read(n)): Unit = {
    val fact = withAudit(buildFact(loadTs, cur, dims), loadTs)
    // one dispatch for both paths (see TableWriter): staged when inside
    // the transactional run, an immediate commit otherwise
    val writer: graft.tables.TableWriter = txn.getOrElse(store)
    if (store.exists("gold.fact_sales")) {
      // incremental load = the reference's SCD1 MERGE on the line grain
      // (34_ETL_Gold_Fact_PySpark.py:90-139): update changed measures/FKs,
      // insert new lines, keep vanished ones. The store's clause-filtered
      // discovery makes this file-pruned — a daily load against a 100 TB
      // fact rewrites only files holding grain rows that actually changed
      // and appends the new lines; everything else carries over.
      import graft.operators.MergeInto
      val keys = Seq("sales_order_key", "sales_line_number")
      val payload = fact.columns.filterNot(c =>
        keys.contains(c) || c == Scd.CreateDate || c == Scd.UpdateDate).toSeq
      val changed = payload.map(c => col(s"t.$c") =!= col(s"s.$c")).reduce(_ || _)
      val matched = Seq(MergeInto.MatchedUpdate(Some(changed),
        payload.map(c => c -> col(s"s.$c")).toMap +
          (Scd.UpdateDate -> loadTs.cast("timestamp"))))
      val notMatched = Seq(MergeInto.NotMatchedInsert(None,
        fact.columns.map(c => c -> col(s"s.$c")).toMap))
      writer.writeMerge("gold.fact_sales", fact, keys,
        matched = matched, notMatched = notMatched)
    } else {
      // initial load: fact snapshot sorted by its grain key inside each
      // file — per-file min/max manifest stats on the key become
      // selective, the file-level pruning lever after directory
      // partitioning (reference facts rely on Delta data skipping for the
      // same effect)
      writer.writeSnapshot("gold.fact_sales", fact,
        sortWithin = Seq("sales_order_key", "sales_line_number"))
    }
  }

  /** The reference's informational star topology (01_Init.py:336-341:
    * `_tf_dim_calendar_id INT REFERENCES gold.dim_calendar(...)`) —
    * recorded, not enforced, like Databricks FK constraints. */
  private def factMetadata(): Unit = {
    store.setForeignKey("gold.fact_sales", "fk_calendar",
      Seq("_tf_dim_calendar_id"), "gold.dim_calendar", Seq("date_key"))
    store.setForeignKey("gold.fact_sales", "fk_customer",
      Seq("_tf_dim_customer_id"), "gold.dim_customer", Seq("_tf_dim_customer_id"))
    store.setForeignKey("gold.fact_sales", "fk_geography",
      Seq("_tf_dim_geography_id"), "gold.dim_geography", Seq("_tf_dim_geography_id"))
  }

  def run(loadTs: Column): Unit = {
    // stage names surface in the Spark UI / job listeners, so a slow load
    // attributes to its medallion stage without guesswork
    def staged(stage: String)(body: => Unit): Unit = {
      spark.sparkContext.setJobDescription(s"medallion: $stage")
      try body finally spark.sparkContext.setJobDescription(null)
    }
    staged("bronze")(runBronze())
    staged("silver scd2")(runSilver(loadTs))
    staged("gold dims")(runGoldDims(loadTs))
    staged("gold fact")(runGoldFact(loadTs))
  }

  /** Test seam: abort the transactional run after a named stage finishes
    * staging ("silver", "gold dims") — simulates a crash mid-run. */
  private[graft] var crashAfterStageForTest: Option[String] = None

  /** The whole bronze → silver → gold run staged as ONE store
    * transaction: every ordinary reader sees the PRE-run state of all
    * thirteen tables until the all-or-nothing commit publishes them
    * together, so a run() that crashes anywhere mid-pipeline is invisible
    * (the per-stage [[run]] can leave new bronze + old gold for a late
    * crash — fine for a benchmarked rebuild, wrong for a warehouse
    * readers query during loads).
    *
    * Stage dependencies thread THROUGH the transaction: silver consumes
    * the same source frames bronze stages (bronze is by construction a
    * snapshot of them), and gold reads silver/dims via [[Txn.readStaged]]
    * — read-your-writes over the staged manifests. Staged reads skip the
    * manifest-stats file pruning (each staged version is consumed once,
    * by this run, not served); the published read path keeps it.
    * Bronze + silver stage concurrently (independent tables, same rule
    * as the parallel multi-index ingest); dims wait on silver, fact on
    * dims. Metadata sidecars are unversioned and apply after the
    * publish. Bucketed-fact mode publishes catalog tables outside the
    * store, so it cannot join the transaction. */
  def runTransactional(loadTs: Column): Unit = {
    require(!bucketedFact,
      "bucketedFact publishes catalog tables outside the store transaction")
    store.transaction { txn =>
      def checkpoint(stage: String): Unit =
        if (crashAfterStageForTest.contains(stage))
          sys.error(s"simulated crash after $stage staging")
      val src = bronzeTables.map(n => n -> Tables.t(spark, sfDir, n)).toMap
      inParallel(
        bronzeTables.map(n => () => txn.createOrReplace(s"bronze.$n", src(n))) ++
          silverSpecs.map { case (name, keys) => () =>
            Scd.scd2ApplyBatch(store, s"silver.$name", dedupKey(src(name), keys),
              keys, loadTs, initAudit = true, txn = Some(txn))
          })
      checkpoint("silver")
      val stagedCur = (n: String) =>
        txn.readStaged(n).filter(col(Scd.ValidTo).isNull)
      stageGoldDims(loadTs, stagedCur, (n, df) => txn.createOrReplace(n, df))
      checkpoint("gold dims")
      stageGoldFact(loadTs, Some(txn), stagedCur, n => txn.readStaged(n))
    }
    dimMetadata()
    factMetadata()
  }
}
