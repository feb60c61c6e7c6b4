package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.sources.Tables.t

/** Core relational query surface (SURVEY.md §2.3–§2.9): projections,
  * filters, joins (inner/left/semi/anti), aggregations, grouping
  * sets/rollup/cube, window functions, sorts/top-k, set ops, scalar
  * date/string/conditional functions.
  *
  * Determinism conventions (oracle parity with DuckDB):
  *  - Money-ish double aggregates are cast to DECIMAL(18,6) *before*
  *    summation, so the aggregation is exact decimal arithmetic and
  *    independent of partitioning/summation order; the final column is cast
  *    back to DOUBLE. Plain double sums would differ from the oracle in the
  *    last ulp depending on shuffle order.
  *  - Every query ends in a total ORDER BY over a unique key set.
  *  - Averages are exact-decimal sums divided in double space.
  */
object CoreQueries {

  private def dec6(c: Column): Column = c.cast(DecimalType(18, 6))
  private def d(c: Column): Column = c.cast(DoubleType)

  // q1: TPC-H Q1-style pricing summary — wide aggregate, map-side partial agg
  // (hash aggregate; shuffle is 4 groups only). Reference surface: SURVEY §2.5.
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        d(sum(dec6(col("l_quantity")))).as("sum_qty"),
        d(sum(dec6(col("l_extendedprice")))).as("sum_base_price"),
        d(round(sum(dec6(col("l_extendedprice")) * dec6(lit(1.0) - col("l_discount"))), 6)).as("sum_disc_price"),
        d(round(sum(dec6(col("l_extendedprice")) * dec6((lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))), 6)).as("sum_charge"),
        (d(sum(dec6(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        (d(sum(dec6(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (d(sum(dec6(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // q2: projection + filter — predicate and column pruning reach the parquet
  // scan (PushedFilters). Per-row computed column, no aggregation.
  def q2FilterProject(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") > lit(0.05) && col("l_quantity") < lit(24.0))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  // q3: TPC-H Q3-style shipping priority — 3-way join, agg, top-k.
  // customer is small → Catalyst broadcasts it; lineitem⋈orders shuffles on
  // the join key once and the groupBy reuses that partitioning.
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1997-03-15").cast("timestamp"))
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1997-03-15").cast("timestamp"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(d(round(sum(dec6(col("l_extendedprice")) * dec6(lit(1.0) - col("l_discount"))), 6)).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // q4: EXISTS → left-semi join (no row multiplication, small build side
  // streamed); count by priority.
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    o.join(li,
        o("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  // q5: 6-way star join — region/nation/supplier broadcast; the only real
  // shuffles are lineitem⋈orders and the final small agg.
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val o = t(s, dir, "orders").filter(
      col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
      col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(s, dir, "lineitem")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(d(round(sum(dec6(col("l_extendedprice")) * dec6(lit(1.0) - col("l_discount"))), 6)).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // q6: single scalar aggregate over a pushed-down range filter.
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= lit(0.05) && col("l_discount") <= lit(0.07) &&
        col("l_quantity") < lit(24.0))
      .agg(d(round(sum(dec6(col("l_extendedprice")) * dec6(col("l_discount"))), 6)).as("revenue"))
  }

  // q7: window functions — rank / lag / running sum per customer
  // (SURVEY §2.6). One shuffle on the partition key; all three windows share
  // the same (partitionBy, orderBy) so Spark evaluates them in one Window op.
  def q7WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        row_number().over(w).as("rn"),
        d(lag(dec6(col("o_totalprice")), 1).over(w)).as("prev_price"),
        d(sum(dec6(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, 0))).as("running_total"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  // q8: top-k per group via row_number + filter (the standard Spark pattern
  // for grouped top-k — no global sort, rank computed within partitions).
  def q8TopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
    p.select(col("p_brand"), col("p_partkey"), col("p_name"), col("p_retailprice"), row_number().over(w).as("rk"))
      .filter(col("rk") <= 3)
      .orderBy(col("p_brand"), col("rk"))
  }

  // q9: ROLLUP over two grouping columns. NULL group markers are coalesced
  // to a sentinel so row ordering is total and NULL-ordering-neutral across
  // engines.
  def q9Rollup(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), d(sum(dec6(col("l_quantity")))).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  // q10: CUBE over order status/priority.
  def q10Cube(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), d(sum(dec6(col("o_totalprice")))).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("orderpriority"),
        col("n"), col("sum_price"))
      .orderBy(col("orderstatus"), col("orderpriority"))
  }

  // q11: NOT EXISTS → left-anti join (recent orders only, so the result is
  // non-empty: customers with no orders since 2000).
  def q11AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  // q12: conditional aggregation (CASE WHEN inside agg — SURVEY §2.9).
  def q12ConditionalAgg(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("l_quantity") >= 25.0, 1L).otherwise(0L)).as("high_qty_lines"),
        sum(when(col("l_quantity") < 25.0, 1L).otherwise(0L)).as("low_qty_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("returned_lines"))
      .orderBy(col("o_orderpriority"))
  }

  // q13: string function surface — upper/lower/substring/concat/LIKE/length.
  def q13StringFuncs(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    p.filter(col("p_type").like("%BRASS%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        substring(col("p_type"), 1, 6).as("type_prefix"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("type_last_word"),
        lpad(col("p_brand"), 12, "#").as("brand_padded"),
        translate(col("p_name"), " ", "_").as("name_snake"),
        replace(col("p_type"), lit(" "), lit("-")).as("type_dashed"))
      .orderBy(col("p_partkey"))
  }

  // q14: date-part aggregation — monthly order revenue.
  def q14MonthlyRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_orders"), d(sum(dec6(col("o_totalprice")))).as("revenue"))
      .orderBy(col("y"), col("m"))
  }

  // q20: distinct + set operations — nations having customers vs suppliers
  // (UNION/INTERSECT/EXCEPT surface, SURVEY §2.8).
  def q20SetOps(s: SparkSession, dir: String): DataFrame = {
    val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
    val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
    val union = cn.union(sn).distinct().withColumn("set_op", lit("union"))
    val inter = cn.intersect(sn).withColumn("set_op", lit("intersect"))
    val exc = cn.except(sn).withColumn("set_op", lit("except"))
    union.unionByName(inter).unionByName(exc)
      .orderBy(col("set_op"), col("nationkey"))
  }

  // q21: count-distinct surface (exact; approx variant is bench-only since
  // HLL sketches differ across engines).
  def q21DistinctAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary _,
    "q2_filter_project" -> q2FilterProject _,
    "q3_shipping_priority" -> q3ShippingPriority _,
    "q4_order_priority" -> q4OrderPriority _,
    "q5_local_supplier" -> q5LocalSupplier _,
    "q6_forecast_revenue" -> q6ForecastRevenue _,
    "q7_window_running" -> q7WindowRunning _,
    "q8_topk_per_group" -> q8TopKPerGroup _,
    "q9_rollup" -> q9Rollup _,
    "q10_cube" -> q10Cube _,
    "q11_anti_join" -> q11AntiJoin _,
    "q12_conditional_agg" -> q12ConditionalAgg _,
    "q13_string_funcs" -> q13StringFuncs _,
    "q14_monthly_revenue" -> q14MonthlyRevenue _,
    "q20_set_ops" -> q20SetOps _,
    "q21_distinct_agg" -> q21DistinctAgg _)

  /** DuckDB-dialect oracle SQL, same semantics and column names/order
    * conventions as the Spark implementations above. */
  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(CAST(1.0 AS DOUBLE)-l_discount AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST((CAST(1.0 AS DOUBLE)-l_discount)*(CAST(1.0 AS DOUBLE)+l_tax) AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  l_extendedprice * (CAST(1.0 AS DOUBLE)-l_discount) AS net_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount > 0.05 AND l_quantity < 24.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(CAST(1.0 AS DOUBLE)-l_discount AS DECIMAL(18,6))), 6) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00' AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(CAST(1.0 AS DOUBLE)-l_discount AS DECIMAL(18,6))), 6) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 6) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin,
    "q7_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  ROW_NUMBER() OVER w AS rn,
        |  CAST(LAG(CAST(o_totalprice AS DECIMAL(18,6)), 1) OVER w AS DOUBLE) AS prev_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q8_topk_per_group" ->
      """SELECT p_brand, p_partkey, p_name, p_retailprice, rk FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part) WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "q9_rollup" ->
      """SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
        |  COALESCE(l_linestatus, '(all)') AS linestatus,
        |  COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q10_cube" ->
      """SELECT COALESCE(o_orderstatus, '(all)') AS orderstatus,
        |  COALESCE(o_orderpriority, '(all)') AS orderpriority,
        |  COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY orderstatus, orderpriority""".stripMargin,
    "q11_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q12_conditional_agg" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN l_quantity >= 25.0 THEN 1 ELSE 0 END) AS BIGINT) AS high_qty_lines,
        |  CAST(SUM(CASE WHEN l_quantity < 25.0 THEN 1 ELSE 0 END) AS BIGINT) AS low_qty_lines,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q13_string_funcs" ->
      """SELECT p_partkey, UPPER(p_name) AS name_upper, LOWER(p_brand) AS brand_lower,
        |  SUBSTRING(p_type, 1, 6) AS type_prefix,
        |  p_brand || '/' || p_type AS brand_type,
        |  LENGTH(p_name) AS name_len,
        |  COALESCE(regexp_extract(p_type, '([A-Z]+)$', 1), '') AS type_last_word,
        |  lpad(p_brand, 12, '#') AS brand_padded,
        |  translate(p_name, ' ', '_') AS name_snake,
        |  replace(p_type, ' ', '-') AS type_dashed
        |FROM part WHERE p_type LIKE '%BRASS%' ORDER BY p_partkey""".stripMargin,
    "q14_monthly_revenue" ->
      """SELECT CAST(YEAR(o_orderdate) AS INT) AS y, CAST(MONTH(o_orderdate) AS INT) AS m,
        |  COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,
    "q20_set_ops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
        |     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        |SELECT nationkey, set_op FROM (
        |  SELECT nationkey, 'union' AS set_op FROM (SELECT nationkey FROM cn UNION SELECT nationkey FROM sn)
        |  UNION ALL
        |  SELECT nationkey, 'intersect' AS set_op FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
        |  UNION ALL
        |  SELECT nationkey, 'except' AS set_op FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn))
        |ORDER BY set_op, nationkey""".stripMargin,
    "q21_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_lines
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
