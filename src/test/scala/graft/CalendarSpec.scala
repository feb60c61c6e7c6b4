package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Calendar

/** Calendar generator pins (SURVEY.md §5 unit-test plan): smart-key
  * round-trip, Monday week bounds, fiscal quarter/year boundaries,
  * formatted labels at known dates. */
class CalendarSpec extends AnyFunSuite {

  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  private lazy val cal = Calendar.build(spark, "2019-12-25", "2020-10-10")
    .select($"date_key", $"cal_date".cast("string"), $"day_name", $"weekday_idx",
      $"week_start".cast("string"), $"week_end".cast("string"),
      $"fiscal_quarter", $"fiscal_year", $"month_start".cast("string"),
      $"month_end".cast("string"), $"date_label")
    .as[(Int, String, String, Int, String, String, Int, Int, String, String, String)]
    .collect().map(r => r._1 -> r).toMap

  test("smart key round-trips year/month/day") {
    assert(cal.contains(20200229), "leap day exists")
    assert(cal(20200229)._2 == "2020-02-29")
    assert(cal(20200101)._2 == "2020-01-01")
  }

  test("weeks start on Monday and span 7 days") {
    val (_, _, dayName, wd, ws, we, _, _, _, _, _) = cal(20200108) // a Wednesday
    assert(dayName == "Wednesday" && wd == 2)
    assert(ws == "2020-01-06" && we == "2020-01-12")
    // a Monday is its own week start
    assert(cal(20200106)._5 == "2020-01-06")
  }

  test("fiscal columns follow the reference (01_Init.py:223-229): " +
    "quarter = calendar quarter, fiscal year = YEAR(date + 89 days)") {
    // fiscal quarter is the plain calendar quarter number
    assert(cal(20200101)._7 == 1 && cal(20200630)._7 == 2)
    assert(cal(20200701)._7 == 3 && cal(20201010)._7 == 4)
    // fiscal year rolls over when date+89d crosses Jan 1: Oct 3 is the
    // last day of FY2020, Oct 4 the first day of FY2021
    assert(cal(20201003)._8 == 2020)
    assert(cal(20201004)._8 == 2021)
    assert(cal(20200101)._8 == 2020 && cal(20191231)._8 == 2020)
  }

  test("month bounds honor add_months/last_day semantics incl. leap February") {
    assert(cal(20200315)._9 == "2020-03-01" && cal(20200315)._10 == "2020-03-31")
    assert(cal(20200301)._9 == "2020-03-01", "March 1 after leap February")
    assert(cal(20200215)._10 == "2020-02-29", "leap month end")
  }

  test("formatted labels match reference patterns (01_Init.py:203-204)") {
    assert(cal(20200104)._11 == "Saturday January 04 2020")
  }
}
