package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{AsOfJoin, Salting}
import graft.sources.Tables
import graft.sources.Tables.t
import graft.streaming.EventStreams

/** Advanced operator surface: as-of join, salted aggregation, the SQL
  * warehouse endpoint (arbitrary Spark SQL over registered views — the
  * reference's Power BI serving path, SURVEY.md §2.5/§2.6), and exact
  * interpolated percentiles.
  */
object AdvancedQueries {

  // x14: as-of join — for each click event, the user's most recent purchase
  // at or before the click (NULLs when none). Right side deduped
  // deterministically per (user, ts).
  def x14AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = EventStreams.normalizeTs(t(s, dir, "events"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val w = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    AsOfJoin.asofBackward(
        clicks, purchases, Seq("user_id"), "ts", "ts",
        Map("ts" -> "purchase_ts", "value" -> "purchase_value"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  // x15: salted two-phase aggregation over the (3-key, maximally skewed)
  // returnflag column — logical result equals the direct groupBy, which is
  // exactly what the oracle checks.
  def x15SaltedAgg(s: SparkSession, dir: String): DataFrame =
    Salting.saltedSumCount(
        t(s, dir, "lineitem"), Seq("l_returnflag"),
        col("l_quantity").cast("decimal(18,6)"), buckets = 16)
      .select(col("l_returnflag"),
        col("sum_value").cast("double").as("sum_qty"), col("n"))
      .orderBy(col("l_returnflag"))

  // q24: the SQL warehouse endpoint — one ANSI statement (CTE + scalar
  // subquery + join + aggregation) submitted verbatim to spark.sql over
  // registered views; the oracle is the very same text in DuckDB.
  private val WarehouseSql =
    """WITH spend AS (
      |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS total_spend,
      |         COUNT(*) AS n_orders
      |  FROM orders GROUP BY o_custkey)
      |SELECT c_mktsegment,
      |  COUNT(*) AS n_customers,
      |  CAST(SUM(n_orders) AS BIGINT) AS n_orders,
      |  CAST(SUM(total_spend) AS DOUBLE) AS segment_spend
      |FROM customer JOIN spend ON c_custkey = o_custkey
      |WHERE total_spend > (SELECT AVG(total_spend) FROM spend)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  def q24SqlWarehouse(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(WarehouseSql)
  }

  // q38: explicit GROUPING SETS (beyond rollup q9 / cube q10) — one ANSI
  // text submitted verbatim to both engines, like q24.
  private val GroupingSetsSql =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COALESCE(o_orderstatus, 'ALL') AS status,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      |ORDER BY priority, status""".stripMargin

  def q38GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(GroupingSetsSql)
  }

  // q39: value-RANGE window frame — trailing 90-day revenue per customer
  // (rows-frames are q7; RANGE frames bound by the ORDER BY value are a
  // distinct execution surface). Day numbers are integers so the frame
  // semantics are engine-identical.
  def q39RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        datediff(col("o_orderdate"), lit("1990-01-01").cast("timestamp")).as("day_num"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_num"))
      .rangeBetween(-90, Window.currentRow)
    o.select(col("o_orderkey"), col("o_custkey"), col("day_num"),
        round(sum(col("o_totalprice").cast("decimal(18,6)")).over(w), 6)
          .cast("double").as("trailing_90d"))
      .orderBy(col("o_orderkey"))
  }

  // q40: ranking-function window surface — ntile, percent_rank, cume_dist,
  // dense_rank over one pass (complements q7's rank/lag/running frames).
  def q40RankingWindows(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
    t(s, dir, "customer")
      .filter(col("c_custkey") % 20 === 0)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        // ranks cast to BIGINT: DuckDB's NTILE/DENSE_RANK are 64-bit
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        dense_rank().over(w).cast("long").as("drank"))
      .orderBy(col("c_custkey"))
  }

  // q25: exact interpolated percentiles (Spark `percentile` == DuckDB
  // `quantile_cont`), rounded for cross-engine float stability.
  def q25Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50_price"),
        round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99_price"))
      .orderBy(col("l_returnflag"))

  // q26: approximate aggregates (HLL distinct counts, approximate
  // percentiles). Sketch ESTIMATES can't hash-match across engines, so the
  // query asserts its own accuracy contract and emits checkable output:
  // the exact values plus booleans stating each sketch landed within
  // tolerance (HLL at rsd 0.01 gated at 5% = 5 sigma; percentile_approx at
  // accuracy 1000 gated at 5% of the exact p50). HLL is deterministic for
  // a given input, so the booleans are stable; the DuckDB oracle
  // recomputes the exact values and expects every boolean TRUE — a sketch
  // accuracy regression now breaks the hash instead of going unchecked.
  def q26Approx(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("exact_p50"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_p50"))
      .select(col("l_returnflag"),
        col("exact_orders"), col("exact_parts"), col("exact_p50"),
        (abs(col("approx_orders") - col("exact_orders"))
          <= col("exact_orders") * lit(0.05)).as("orders_ok"),
        (abs(col("approx_parts") - col("exact_parts"))
          <= col("exact_parts") * lit(0.05)).as("parts_ok"),
        (abs(col("approx_p50") - col("exact_p50"))
          <= col("exact_p50") * lit(0.05)).as("p50_ok"))
      .orderBy(col("l_returnflag"))

  // x37: top-k-per-group via the native bounded_topk aggregate — the
  // scale-correct twin of q8's window idiom. The window must shuffle and
  // sort EVERY row of every group; bounded_topk is a
  // TypedImperativeAggregate, so each map task first reduces its slice of
  // a group to ≤ k rows in a bounded min-heap and only those survivors
  // shuffle (PlanSpec pins the partial ObjectHashAggregate below the
  // exchange). The trailing o_orderkey field makes the order total, so
  // the window oracle reproduces it exactly.
  def x37TopKAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.TopK.bounded_topk(5,
        struct(col("o_totalprice"), col("o_orderkey"))).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rk"),
        col("t.o_totalprice").as("o_totalprice"), col("t.o_orderkey").as("o_orderkey"))
      .orderBy(col("o_orderpriority"), col("rk"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x37_topk_agg" -> x37TopKAgg _,
    "x14_asof_join" -> x14AsofJoin _,
    "x15_salted_agg" -> x15SaltedAgg _,
    "q24_sql_warehouse" -> q24SqlWarehouse _,
    "q25_percentiles" -> q25Percentiles _,
    "q26_approx" -> q26Approx _,
    "q38_grouping_sets" -> q38GroupingSets _,
    "q39_range_frame" -> q39RangeFrame _,
    "q40_ranking_windows" -> q40RankingWindows _)

  val oracles: Map[String, String] = Map(
    "x37_topk_agg" ->
      """SELECT o_orderpriority, rk, o_totalprice, o_orderkey FROM (
        |  SELECT o_orderpriority, o_totalprice, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rk
        |  FROM orders) t
        |WHERE rk <= 5 ORDER BY o_orderpriority, rk""".stripMargin,
    "x14_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_type FROM events),
        |clicks AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
        |p0 AS (SELECT user_id, ts, value, event_id,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |       FROM e WHERE event_type = 'purchase'),
        |purchases AS (SELECT user_id, ts, value FROM p0 WHERE rn = 1)
        |SELECT clicks.event_id, clicks.user_id, clicks.ts,
        |  purchases.ts AS purchase_ts, purchases.value AS purchase_value
        |FROM clicks ASOF LEFT JOIN purchases
        |  ON clicks.user_id = purchases.user_id AND purchases.ts <= clicks.ts
        |ORDER BY clicks.user_id, clicks.ts, clicks.event_id""".stripMargin,
    "x15_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q24_sql_warehouse" -> WarehouseSql,
    "q38_grouping_sets" -> GroupingSetsSql,
    "q40_ranking_windows" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  NTILE(4) OVER w AS quartile,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        |  ROUND(CUME_DIST() OVER w, 6) AS cume,
        |  DENSE_RANK() OVER w AS drank
        |FROM customer WHERE c_custkey % 20 = 0
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q39_range_frame" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day_num
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, day_num,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY day_num
        |    RANGE BETWEEN 90 PRECEDING AND CURRENT ROW), 6) AS DOUBLE) AS trailing_90d
        |FROM o ORDER BY o_orderkey""".stripMargin,
    "q26_approx" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
        |  TRUE AS orders_ok, TRUE AS parts_ok, TRUE AS p50_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q25_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |  ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
        |  ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
