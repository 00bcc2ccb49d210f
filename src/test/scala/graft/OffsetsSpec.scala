package graft

import graft.operators.Offsets
import org.apache.spark.sql.functions._

/** Anchored-offset algebra vs pandas ground truth. Every expected value
  * below was produced by pandas itself (resample('W-SUN'/'Q-NOV'/'A-JUN')
  * bin labels; `ts + Week(weekday=2) / MonthBegin / MonthEnd /
  * QuarterEnd(startingMonth=12) / YearEnd(month=6)`), pinning the
  * rollforward-vs-advance distinction and the leap/on-anchor edges. */
class OffsetsSpec extends SparkSpec {
  import spark.implicits._

  private def dates(ds: String*) =
    ds.toDF("s").select(col("s").cast("date").as("d"))

  private def got(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.get(0).toString).toSeq

  test("week anchor label (W-SUN): rollforward, on-anchor stays") {
    val in = dates("2024-01-15", "2024-01-07", "2024-02-29", "2023-12-31", "2024-01-03")
    val out = got(in.select(Offsets.weekAnchorLabel(col("d"), 6)))
    assert(out == Seq("2024-01-21", "2024-01-07", "2024-03-03", "2023-12-31", "2024-01-07"))
  }

  test("week rollback label (closed='left'): largest anchor <= d") {
    // pandas resample('W-SUN', closed='left', label='left'): Jan 7/8/10
    // all label Jan 7; Jan 14 labels itself
    val in = dates("2024-01-07", "2024-01-08", "2024-01-10", "2024-01-14")
    assert(got(in.select(Offsets.weekAnchorLabelBack(col("d"), 6))) ==
      Seq("2024-01-07", "2024-01-07", "2024-01-07", "2024-01-14"))
  }

  test("quarter/year end labels (Q-NOV, A-JUN)") {
    val in = dates("2024-01-15", "2023-12-31", "2024-06-30", "2024-02-29")
    val q = got(in.select(Offsets.quarterEndLabel(col("d"), 11)))
    assert(q == Seq("2024-02-29", "2024-02-29", "2024-08-31", "2024-02-29"))
    val a = got(in.select(Offsets.yearEndLabel(col("d"), 6)))
    assert(a == Seq("2024-06-30", "2024-06-30", "2024-06-30", "2024-06-30"))
  }

  test("shifts advance a full period when on-anchor") {
    val in = dates("2024-01-15", "2024-01-03", "2024-01-31", "2024-01-01",
      "2024-02-29", "2023-12-31", "2024-06-30")
    assert(got(in.select(Offsets.shiftWeek(col("d"), 2))) ==
      Seq("2024-01-17", "2024-01-10", "2024-02-07", "2024-01-03",
        "2024-03-06", "2024-01-03", "2024-07-03"))
    assert(got(in.select(Offsets.shiftMonthBegin(col("d")))) ==
      Seq("2024-02-01", "2024-02-01", "2024-02-01", "2024-02-01",
        "2024-03-01", "2024-01-01", "2024-07-01"))
    assert(got(in.select(Offsets.shiftMonthEnd(col("d")))) ==
      Seq("2024-01-31", "2024-01-31", "2024-02-29", "2024-01-31",
        "2024-03-31", "2024-01-31", "2024-07-31"))
    assert(got(in.select(Offsets.shiftQuarterEnd(col("d"), 12))) ==
      Seq("2024-03-31", "2024-03-31", "2024-03-31", "2024-03-31",
        "2024-03-31", "2024-03-31", "2024-09-30"))
    assert(got(in.select(Offsets.shiftYearEnd(col("d"), 6))) ==
      Seq("2024-06-30", "2024-06-30", "2024-06-30", "2024-06-30",
        "2024-06-30", "2024-06-30", "2025-06-30"))
  }

  test("n-period shifts compose as pandas d + n*Offset()") {
    val in = dates("2024-01-15", "2024-01-31", "2023-12-31")
    assert(got(in.select(Offsets.shiftWeek(col("d"), 2, 2))) ==
      Seq("2024-01-24", "2024-02-14", "2024-01-10"))
    assert(got(in.select(Offsets.shiftMonthBegin(col("d"), 2))) ==
      Seq("2024-03-01", "2024-03-01", "2024-02-01"))
    assert(got(in.select(Offsets.shiftMonthEnd(col("d"), 3))) ==
      Seq("2024-03-31", "2024-04-30", "2024-03-31"))
    assert(got(in.select(Offsets.shiftQuarterEnd(col("d"), 12, 2))) ==
      Seq("2024-06-30", "2024-06-30", "2024-06-30"))
    assert(got(in.select(Offsets.shiftYearEnd(col("d"), 6, 2))) ==
      Seq("2025-06-30", "2025-06-30", "2025-06-30"))
  }

  test("BusinessHour shifts match pandas (spill, weekend, pre-open, n>1)") {
    import org.apache.spark.sql.functions.to_timestamp
    val in = Seq("2024-01-02 10:15:30", "2024-01-02 16:00:00",
      "2024-01-02 16:30:45", "2024-01-02 17:00:00", "2024-01-05 16:30:00",
      "2024-01-06 12:00:00", "2024-01-02 07:30:00", "2024-01-02 17:45:00",
      "2024-01-01 00:00:00").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    assert(got(in.select(Offsets.shiftBusinessHour(col("ts")))) ==
      Seq("2024-01-02 11:15:30.0", "2024-01-03 09:00:00.0",
        "2024-01-03 09:30:45.0", "2024-01-03 10:00:00.0",
        "2024-01-08 09:30:00.0", "2024-01-08 10:00:00.0",
        "2024-01-02 10:00:00.0", "2024-01-03 10:00:00.0",
        "2024-01-01 10:00:00.0"))
    val fri = Seq("2024-01-05 15:00:00").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    assert(got(fri.select(Offsets.shiftBusinessHour(col("ts"), 3))) ==
      Seq("2024-01-08 10:00:00.0"))
  }

  test("FY5253 retail year ends match pandas (nearest and last variations)") {
    val in = dates("2024-01-15", "2024-02-03", "2024-02-04", "2024-06-30",
      "2023-12-31", "2024-01-27")
    assert(got(in.select(Offsets.shiftFY5253(col("d"), 5, 1, "nearest"))) ==
      Seq("2024-02-03", "2025-02-01", "2025-02-01", "2025-02-01",
        "2024-02-03", "2024-02-03"))
    assert(got(in.select(Offsets.shiftFY5253(col("d"), 5, 1, "last"))) ==
      Seq("2024-01-27", "2025-01-25", "2025-01-25", "2025-01-25",
        "2024-01-27", "2025-01-25"))
    // December-ending year whose 'nearest' anchor spills into January:
    // FY2021 ends Sat 2022-01-01, so early-Jan 2021 dates must see the
    // PREVIOUS calendar year's anchor (pandas-pinned)
    val dec = dates("2021-01-02", "2021-12-30", "2022-01-01")
    assert(got(dec.select(Offsets.shiftFY5253(col("d"), 5, 12, "nearest"))) ==
      Seq("2022-01-01", "2022-01-01", "2022-12-31"))
  }

  test("WeekOfMonth / LastWeekOfMonth shifts match pandas") {
    val in = dates("2024-01-01", "2024-01-10", "2024-01-11", "2024-01-26",
      "2024-01-31", "2024-02-14", "2023-12-31")
    assert(got(in.select(Offsets.shiftWeekOfMonth(col("d"), 1, 2))) ==
      Seq("2024-01-10", "2024-02-14", "2024-02-14", "2024-02-14",
        "2024-02-14", "2024-03-13", "2024-01-10"))
    assert(got(in.select(Offsets.shiftLastWeekOfMonth(col("d"), 4))) ==
      Seq("2024-01-26", "2024-01-26", "2024-01-26", "2024-02-23",
        "2024-02-23", "2024-02-23", "2024-01-26"))
  }

  test("semi-month shifts match pandas SemiMonthEnd/SemiMonthBegin") {
    val in = dates("2024-01-10", "2024-01-15", "2024-01-20", "2024-01-31",
      "2024-01-01", "2024-02-14", "2024-02-29")
    assert(got(in.select(Offsets.shiftSemiMonthEnd(col("d")))) ==
      Seq("2024-01-15", "2024-01-31", "2024-01-31", "2024-02-15",
        "2024-01-15", "2024-02-15", "2024-03-15"))
    assert(got(in.select(Offsets.shiftSemiMonthBegin(col("d")))) ==
      Seq("2024-01-15", "2024-02-01", "2024-02-01", "2024-02-01",
        "2024-01-15", "2024-02-15", "2024-03-01"))
  }

  test("negative-n shifts land strictly before d (pandas d - Offset())") {
    val in = dates("2024-01-15", "2024-01-17", "2024-01-31", "2024-01-01",
      "2024-02-29", "2023-12-31")
    assert(got(in.select(Offsets.shiftWeek(col("d"), 2, -1))) ==
      Seq("2024-01-10", "2024-01-10", "2024-01-24", "2023-12-27",
        "2024-02-28", "2023-12-27"))
    assert(got(in.select(Offsets.shiftMonthBegin(col("d"), -1))) ==
      Seq("2024-01-01", "2024-01-01", "2024-01-01", "2023-12-01",
        "2024-02-01", "2023-12-01"))
    assert(got(in.select(Offsets.shiftMonthEnd(col("d"), -1))) ==
      Seq("2023-12-31", "2023-12-31", "2023-12-31", "2023-12-31",
        "2024-01-31", "2023-11-30"))
    assert(got(in.select(Offsets.shiftMonthEnd(col("d"), -2))) ==
      Seq("2023-11-30", "2023-11-30", "2023-11-30", "2023-11-30",
        "2023-12-31", "2023-10-31"))
    assert(got(in.select(Offsets.shiftQuarterEnd(col("d"), 12, -1))) ==
      Seq("2023-12-31", "2023-12-31", "2023-12-31", "2023-12-31",
        "2023-12-31", "2023-09-30"))
    assert(got(in.select(Offsets.shiftYearEnd(col("d"), 6, -1))) ==
      Seq("2023-06-30", "2023-06-30", "2023-06-30", "2023-06-30",
        "2023-06-30", "2023-06-30"))
  }

  test("fiscal period labels match pandas Period(freq='Q-NOV'/'A-JUN')") {
    val in = dates("1995-07-15", "1995-11-30", "1995-12-01", "1996-02-29",
      "1996-03-15", "1995-01-10")
    assert(got(in.select(Offsets.fiscalQuarterLabel(col("d"), 11))) ==
      Seq("1995Q3", "1995Q4", "1996Q1", "1996Q1", "1996Q2", "1995Q1"))
    assert(got(in.select(Offsets.fiscalYear(col("d"), 6))) ==
      Seq("1996", "1996", "1996", "1996", "1996", "1995"))
  }

  test("custom business day skips weekends and listed holidays") {
    val hol = Seq("1995-12-25", "1995-12-26", "1996-01-01")
    val in = dates("1995-12-22", "1995-12-23", "1995-12-24", "1995-12-29",
      "1995-12-31", "1995-06-14")
    // pandas CustomBusinessDay(holidays=...) outputs, captured verbatim
    assert(got(in.select(Offsets.shiftBusinessDay(col("d"), hol))) ==
      Seq("1995-12-27", "1995-12-27", "1995-12-27", "1996-01-02",
        "1996-01-02", "1995-06-15"))
  }

  test("anchored labels work on intraday timestamps (end-of-day bin edge)") {
    val in = Seq("2024-01-07 23:30:00", "2024-02-29 23:59:59")
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    val out = got(in.select(Offsets.weekAnchorLabel(to_date(col("ts")), 6)))
    assert(out == Seq("2024-01-07", "2024-03-03"))
  }

  test("easter offset: pandas `d ± n*Easter()` pins incl. on-anchor advance") {
    // pandas offsets.Easter outputs captured verbatim: +1 / -1 / +2 on
    // mid-year, on-Easter, day-after-Easter, and far-years cases
    val in = dates("2024-01-15", "2024-03-31", "2024-04-01", "2023-12-31",
      "2025-04-20", "2025-04-21", "1995-06-14", "2000-04-23", "2038-04-25")
    assert(got(in.select(Offsets.shiftEaster(col("d")))) ==
      Seq("2024-03-31", "2025-04-20", "2025-04-20", "2024-03-31",
        "2026-04-05", "2026-04-05", "1996-04-07", "2001-04-15", "2039-04-10"))
    assert(got(in.select(Offsets.shiftEaster(col("d"), -1))) ==
      Seq("2023-04-09", "2023-04-09", "2024-03-31", "2023-04-09",
        "2024-03-31", "2025-04-20", "1995-04-16", "1999-04-04", "2037-04-05"))
    assert(got(in.select(Offsets.shiftEaster(col("d"), 2))) ==
      Seq("2025-04-20", "2026-04-05", "2026-04-05", "2025-04-20",
        "2027-03-28", "2027-03-28", "1997-03-30", "2002-03-31", "2040-04-01"))
  }

  test("tick offsets: pandas `ts + Tick(n)` values at microsecond precision") {
    import Offsets._
    // pandas 'ts + offsets.<Unit>(n)' outputs (ns result floored to the
    // engine's microsecond precision), captured verbatim for a mid-day
    // stamp and a year-boundary stamp
    val in = Seq("2024-01-15 10:30:00.123456", "2023-12-31 23:59:59.999999")
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    val cases: Seq[(TickUnit, Long, Seq[String])] = Seq(
      (DayTick, 2L, Seq("2024-01-17 10:30:00.123456", "2024-01-02 23:59:59.999999")),
      (DayTick, -1L, Seq("2024-01-14 10:30:00.123456", "2023-12-30 23:59:59.999999")),
      (HourTick, 3L, Seq("2024-01-15 13:30:00.123456", "2024-01-01 02:59:59.999999")),
      (HourTick, -26L, Seq("2024-01-14 08:30:00.123456", "2023-12-30 21:59:59.999999")),
      (MinuteTick, -90L, Seq("2024-01-15 09:00:00.123456", "2023-12-31 22:29:59.999999")),
      (SecondTick, 5L, Seq("2024-01-15 10:30:05.123456", "2024-01-01 00:00:04.999999")),
      (MilliTick, 1500L, Seq("2024-01-15 10:30:01.623456", "2024-01-01 00:00:01.499999")),
      (MicroTick, -7L, Seq("2024-01-15 10:30:00.123449", "2023-12-31 23:59:59.999992")),
      (NanoTick, 2500L, Seq("2024-01-15 10:30:00.123458", "2024-01-01 00:00:00.000001")),
      (NanoTick, -2500L, Seq("2024-01-15 10:30:00.123453", "2023-12-31 23:59:59.999996")))
    cases.foreach { case (unit, n, want) =>
      val out = got(in.select(
        date_format(Offsets.shiftTick(col("ts"), unit, n),
          "yyyy-MM-dd HH:mm:ss.SSSSSS")))
      assert(out == want, s"${Offsets.tickFreqStr(unit, n)}: $out")
    }
  }

  test("tickOf normalizes durations to the largest exact unit") {
    import Offsets._
    assert(Offsets.tickOf(90L * 60L * 1000000000L) == ((MinuteTick, 90L))) // pandas <90 * Minutes>
    assert(Offsets.tickOf(2L * 86400L * 1000000000L) == ((DayTick, 2L)))
    assert(Offsets.tickOf(1500000L) == ((MicroTick, 1500L))) // 1.5ms is not a Milli tick
    assert(Offsets.tickOf(2500L) == ((NanoTick, 2500L)))
    assert(Offsets.tickFreqStr(HourTick, 3) == "3H")
    assert(Offsets.tickFreqStr(MinuteTick) == "T")
    assert(Offsets.tickFreqStr(MilliTick, 500) == "500L")
  }
}
