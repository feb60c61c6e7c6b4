package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar dimension generator.
  *
  * Re-expresses the reference's `gold.dim_calendar` CTAS
  * (reference: notebooks/01_Init.py:180-233) as a DataFrame program:
  * `sequence` + `explode` over a date range, then derived columns — smart
  * integer date key (`10000*Y + 100*M + D`, 01_Init.py:197), ISO week
  * bounds (01_Init.py:205-216), formatted labels (01_Init.py:203-204,
  * 218-219), and the reference's fiscal columns (01_Init.py:223-229):
  * fiscal quarter = calendar quarter number, fiscal year =
  * YEAR(date + 89 days) — an October-4 fiscal-year start.
  *
  * Scale note: the generated range (30 years ≈ 11k rows) is driver-trivial
  * and always broadcast-joined against facts; generation cost is irrelevant,
  * so the single-row `sequence` → `explode` shape is fine even on a cluster.
  */
object Calendar {

  def build(spark: SparkSession, start: String = "2000-01-01", end: String = "2030-01-01"): DataFrame = {
    val dates = spark.range(1).select(
      explode(sequence(to_date(lit(start)), to_date(lit(end)), expr("INTERVAL 1 DAY"))).as("cal_date"))
    dates.select(
      (year(col("cal_date")) * 10000 + month(col("cal_date")) * 100 + dayofmonth(col("cal_date")))
        .cast("int").as("date_key"),
      col("cal_date"),
      year(col("cal_date")).cast("int").as("cal_year"),
      month(col("cal_date")).cast("int").as("cal_month"),
      dayofmonth(col("cal_date")).cast("int").as("cal_day"),
      date_format(col("cal_date"), "EEEE").as("day_name"),
      date_format(col("cal_date"), "MMMM").as("month_name"),
      date_format(col("cal_date"), "MMMM yyyy").as("month_year_label"),
      date_format(col("cal_date"), "EEEE MMMM dd yyyy").as("date_label"),
      weekday(col("cal_date")).cast("int").as("weekday_idx"), // Monday = 0
      weekofyear(col("cal_date")).cast("int").as("iso_week"),
      date_sub(col("cal_date"), weekday(col("cal_date"))).as("week_start"),
      date_add(date_sub(col("cal_date"), weekday(col("cal_date"))), 6).as("week_end"),
      last_day(col("cal_date")).as("month_end"),
      last_day(add_months(col("cal_date"), -1)).as("prev_month_end"),
      date_add(last_day(add_months(col("cal_date"), -1)), 1).as("month_start"),
      // fiscal columns exactly as the reference defines them
      // (01_Init.py:223-229): fiscal quarter = the *calendar* quarter
      // number (Jan-Mar -> 1 ... Oct-Dec -> 4), fiscal year =
      // YEAR(date + 89 days), i.e. an ~October-4 fiscal-year start.
      quarter(col("cal_date")).cast("int").as("fiscal_quarter"),
      year(date_add(col("cal_date"), 89)).cast("int").as("fiscal_year"))
  }
}
