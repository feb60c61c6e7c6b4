package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables.t

/** Reshaping surface (pivot/unpivot — the BI-endpoint operations the
  * reference's warehouse serves to Power BI) and the typed-Dataset
  * `mapGroups` escape hatch for genuinely imperative per-group logic.
  */
object ReshapeQueries {

  private def dec6(c: Column): Column = c.cast(DecimalType(18, 6))
  private def d(c: Column): Column = c.cast(DoubleType)

  // q31: pivot — revenue matrix priority × status. Pivot values are
  // enumerated explicitly (never inferred by a collect at scale).
  def q31Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(d(round(sum(dec6(col("o_totalprice"))), 6)))
      .na.fill(0.0)
      .orderBy(col("o_orderpriority"))

  // q32: unpivot/melt — wide per-flag metrics into (metric, value) rows.
  def q32Unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        d(sum(dec6(col("l_quantity")))).as("sum_qty"),
        d(round(sum(dec6(col("l_extendedprice"))), 6)).as("sum_price"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  final case class OrderRow(o_orderpriority: String, o_totalprice: Double)

  // q33: typed-Dataset escape hatch for imperative per-group logic (here a
  // running-max count in price order), via the secondary-sort pattern:
  // repartition on the key + sortWithinPartitions makes every group arrive
  // contiguous and value-ordered, so the iterator streams in O(1) heap per
  // group — a skewed group spills in the sort, it never materializes (the
  // naive `mapGroups { rows.toSeq.sortBy }` OOMs exactly there at scale).
  def q33TypedMapGroups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sorted = t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"))
      .repartition(col("o_orderpriority"))
      .sortWithinPartitions(col("o_orderpriority"), col("o_totalprice"))
      .as[OrderRow]
    sorted.mapPartitions { it =>
      new Iterator[(String, Long, Double, Long)] {
        private var head: Option[OrderRow] = if (it.hasNext) Some(it.next()) else None
        def hasNext: Boolean = head.isDefined
        def next(): (String, Long, Double, Long) = {
          val key = head.get.o_orderpriority
          var n = 0L
          var maxSeen = Double.MinValue
          var nNewMax = 0L // how often the running max advanced, in o_totalprice order
          var cur = head
          while (cur.isDefined && cur.get.o_orderpriority == key) {
            val r = cur.get
            n += 1
            if (r.o_totalprice > maxSeen) { maxSeen = r.o_totalprice; nNewMax += 1 }
            cur = if (it.hasNext) Some(it.next()) else None
          }
          head = cur
          (key, n, maxSeen, nNewMax)
        }
      }
    }
      .toDF("o_orderpriority", "n", "max_price", "n_distinct_prices")
      .orderBy(col("o_orderpriority"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_pivot" -> q31Pivot _,
    "q32_unpivot" -> q32Unpivot _,
    "q33_typed_mapgroups" -> q33TypedMapGroups _)

  val oracles: Map[String, String] = Map(
    "q31_pivot" ->
      """SELECT o_orderpriority,
        |  COALESCE(CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,6)) END), 6) AS DOUBLE), 0.0) AS O,
        |  COALESCE(CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,6)) END), 6) AS DOUBLE), 0.0) AS F,
        |  COALESCE(CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,6)) END), 6) AS DOUBLE), 0.0) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q32_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_price
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
        |ORDER BY l_returnflag, metric""".stripMargin,
    "q33_typed_mapgroups" ->
      """SELECT o_orderpriority, COUNT(*) AS n, MAX(o_totalprice) AS max_price,
        |  COUNT(DISTINCT o_totalprice) AS n_distinct_prices
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
