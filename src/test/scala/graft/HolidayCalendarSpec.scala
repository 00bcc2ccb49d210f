package graft

import graft.operators.{HolidayCalendar, Offsets}
import org.scalatest.funsuite.AnyFunSuite

/** Rule-generated holiday dates vs pandas USFederalHolidayCalendar
  * output, captured verbatim for two windows — one pre-Juneteenth
  * (1995-96: also covers Sunday-New-Year and Saturday-Veterans-Day
  * observance shifts) and one post (2023-24). */
class HolidayCalendarSpec extends AnyFunSuite {

  test("US federal calendar matches pandas for 1995-1996") {
    val want = Seq("1995-01-02", "1995-01-16", "1995-02-20", "1995-05-29",
      "1995-07-04", "1995-09-04", "1995-10-09", "1995-11-10", "1995-11-23",
      "1995-12-25", "1996-01-01", "1996-01-15", "1996-02-19", "1996-05-27",
      "1996-07-04", "1996-09-02", "1996-10-14", "1996-11-11", "1996-11-28",
      "1996-12-25")
    val got = HolidayCalendar.dates(HolidayCalendar.usFederal,
      "1995-01-01", "1996-12-31")
    assert(got == want, s"\n$got\nvs\n$want")
  }

  test("US federal calendar matches pandas for 2023-2024 (incl. Juneteenth)") {
    val want = Seq("2023-01-02", "2023-01-16", "2023-02-20", "2023-05-29",
      "2023-06-19", "2023-07-04", "2023-09-04", "2023-10-09", "2023-11-10",
      "2023-11-23", "2023-12-25", "2024-01-01", "2024-01-15", "2024-02-19",
      "2024-05-27", "2024-06-19", "2024-07-04", "2024-09-02", "2024-10-14",
      "2024-11-11", "2024-11-28", "2024-12-25")
    val got = HolidayCalendar.dates(HolidayCalendar.usFederal,
      "2023-01-01", "2024-12-31")
    assert(got == want, s"\n$got\nvs\n$want")
  }

  test("Easter computus matches pandas; GoodFriday/EasterMonday rules") {
    // pandas Easter() landing dates, captured verbatim
    val want = Map(1995 -> "1995-04-16", 2000 -> "2000-04-23",
      2008 -> "2008-03-23", 2011 -> "2011-04-24", 2024 -> "2024-03-31",
      2025 -> "2025-04-20", 2038 -> "2038-04-25")
    want.foreach { case (y, d) =>
      assert(HolidayCalendar.easterSunday(y).toString == d, s"$y")
    }
    // GoodFriday = Easter - 2, EasterMonday = Easter + 1 (pandas rules)
    assert(HolidayCalendar.dates(Seq(HolidayCalendar.EasterOffset(-2)),
      "2024-01-01", "2024-12-31") == Seq("2024-03-29"))
    assert(HolidayCalendar.dates(Seq(HolidayCalendar.EasterOffset(1)),
      "2024-01-01", "2024-12-31") == Seq("2024-04-01"))
  }

  test("calendar feeds the business-day roll") {
    // Fri 1995-12-22 → Wed 1995-12-27 (weekend + observed Christmas Mon
    // is 12-25 itself here, 12-26 not a US holiday — but with the
    // generated list only 12-25 blocks, so next bday = Tue 12-26)
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val hol = HolidayCalendar.dates(HolidayCalendar.usFederal,
      "1995-01-01", "1996-12-31")
    val got = Seq("1995-12-22", "1995-12-29", "1995-11-09")
      .toDF("s").select(col("s").cast("date").as("d"))
      .select(Offsets.shiftBusinessDay(col("d"), hol))
      .collect().map(_.get(0).toString).toSeq
    // pandas: Timestamp + CustomBusinessDay(calendar=USFederalHolidayCalendar())
    assert(got == Seq("1995-12-26", "1996-01-02", "1995-11-13"), got.toString)
  }
}
