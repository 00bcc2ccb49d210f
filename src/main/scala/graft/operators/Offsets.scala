package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Anchored date-offset algebra (reference: pandas/tseries/offsets.py:445-2098
  * — Week(weekday=), QuarterEnd(startingMonth=), YearEnd(month=),
  * MonthBegin/MonthEnd; tests/tseries/offsets/test_offsets.py).
  *
  * Two distinct operations per anchor family, mirroring pandas:
  *
  *   - *label* (rollforward): the smallest anchored date >= d; a date
  *     already on the anchor maps to itself. This is what
  *     `resample('W-SUN')` / `'Q-NOV'` / `'A-JUN'` bins by — pandas
  *     weekly/quarterly bins are (prev_anchor, anchor] BY DATE (the bin
  *     edge is pushed to end-of-label-day by resample's
  *     _adjust_bin_edges, so intraday times on the anchor date stay in
  *     that bin).
  *   - *shift* (`ts + offset`, `shift(freq=)`): a date already on the
  *     anchor advances one full period (pandas `Week(weekday=2)` on a
  *     Wednesday gives next Wednesday).
  *
  * Everything is closed-form calendar arithmetic on DATE — scan-stage
  * codegen, no shuffle, no UDF — and has a direct DuckDB transliteration
  * (the `*Sql` mirrors) so every function is oracle-checkable.
  *
  * Weekday convention: pandas weekday numbers, 0=Monday .. 6=Sunday.
  * Spark's dayofweek() is 1=Sunday..7=Saturday: pandasDow = (dow+5) % 7.
  */
object Offsets {

  /** pandas weekday (0=Mon..6=Sun) of a date column. */
  def pandasDow(d: Column): Column = pmod(dayofweek(d) + 5, lit(7))

  // ---- rollforward labels (resample bins / date_range anchors) ----

  /** W-<weekday> label: roll d forward to the anchor weekday (0=Mon..6=Sun);
    * on-anchor dates are their own label. */
  def weekAnchorLabel(d: Column, anchorDow: Int): Column = {
    require(anchorDow >= 0 && anchorDow <= 6, s"weekday 0..6: $anchorDow")
    date_add(d, pmod(lit(anchorDow) - pandasDow(d), lit(7)).cast("int"))
  }

  /** W-<weekday> ROLLBACK label: largest anchor weekday <= d — the
    * `resample('W-...', closed='left', label='left')` bucketing. */
  def weekAnchorLabelBack(d: Column, anchorDow: Int): Column = {
    require(anchorDow >= 0 && anchorDow <= 6, s"weekday 0..6: $anchorDow")
    date_sub(d, pmod(pandasDow(d) - lit(anchorDow), lit(7)).cast("int"))
  }

  /** Q-<month> label: last day of the earliest month >= d's month that is
    * congruent to the anchor month mod 3 (Q-NOV => quarters ending
    * Feb/May/Aug/Nov). */
  def quarterEndLabel(d: Column, anchorMonth: Int): Column = {
    require(anchorMonth >= 1 && anchorMonth <= 12, s"month 1..12: $anchorMonth")
    last_day(add_months(d, pmod(lit(anchorMonth) - month(d), lit(3)).cast("int")))
  }

  /** A-<month> label: last day of the anchor month at or after d
    * (A-JUN => fiscal years ending June 30). */
  def yearEndLabel(d: Column, anchorMonth: Int): Column = {
    require(anchorMonth >= 1 && anchorMonth <= 12, s"month 1..12: $anchorMonth")
    last_day(add_months(d, pmod(lit(anchorMonth) - month(d), lit(12)).cast("int")))
  }

  /** Fiscal year of d under an A-<month> rule: the calendar year the
    * enclosing fiscal year ENDS in (pandas Period(freq='A-JUN').year). */
  def fiscalYear(d: Column, anchorMonth: Int): Column =
    year(yearEndLabel(d, anchorMonth))

  /** pandas Period(freq='Q-<mon>') label, e.g. '1996Q1' for Dec 1995
    * under Q-NOV: fiscal year of the quarter end, quarter index counted
    * from the fiscal year start. */
  def fiscalQuarterLabel(d: Column, anchorMonth: Int): Column = {
    val qe = quarterEndLabel(d, anchorMonth)
    val fy = yearEndLabel(qe, anchorMonth)
    val diff = (year(fy) * 12 + month(fy)) - (year(qe) * 12 + month(qe))
    // Column./ is double division — cast back to int so the label is
    // "1996Q1", not "1996Q1.0" (diff is a multiple of 3, so exact)
    val qnum = (lit(4) - (diff / lit(3)).cast("int")).cast("string")
    concat(year(fy).cast("string"), lit("Q"), qnum)
  }

  // ---- shifts (d + n·offset, n != 0: pandas `d + n*Offset()`; on-anchor
  // dates advance a full period in n's direction — the first step rolls,
  // the remaining |n|−1 add whole periods. Negative n is the pandas
  // `d - Offset()` family: previous anchor STRICTLY before d.) ----

  /** d + n·Week(weekday=anchor): n-th anchor weekday strictly after
    * (n > 0) / before (n < 0) d. */
  def shiftWeek(d: Column, anchorDow: Int, n: Int = 1): Column = {
    require(anchorDow >= 0 && anchorDow <= 6, s"weekday 0..6: $anchorDow")
    require(n != 0, "n must be nonzero")
    if (n > 0)
      date_add(d,
        (pmod(lit(anchorDow) - pandasDow(d) - 1, lit(7)) + 1 + 7 * (n - 1)).cast("int"))
    else
      date_sub(d,
        (pmod(pandasDow(d) - lit(anchorDow) - 1, lit(7)) + 1 + 7 * (-n - 1)).cast("int"))
  }

  /** d + MonthBegin(n): n-th month start after d (n > 0; any date rolls
    * forward) / before d (n < 0; a month start steps back a month). */
  def shiftMonthBegin(d: Column, n: Int = 1): Column = {
    require(n != 0, "n must be nonzero")
    if (n > 0) trunc(add_months(d, n), "month")
    else {
      val first = when(dayofmonth(d) === 1, trunc(add_months(d, -1), "month"))
        .otherwise(trunc(d, "month"))
      if (n == -1) first else add_months(first, n + 1)
    }
  }

  /** d + MonthEnd(n): for n > 0 this month's last day counts as step one
    * unless d already is it; for n < 0 the previous month ends —
    * uniformly last_day(d − |n| months), since the nearest month end
    * strictly before d always lies in the previous month. */
  def shiftMonthEnd(d: Column, n: Int = 1): Column = {
    require(n != 0, "n must be nonzero")
    if (n > 0) {
      val dd = d.cast("date")
      val first = when(dd === last_day(d), last_day(add_months(d, 1))).otherwise(last_day(d))
      if (n == 1) first else last_day(add_months(first, n - 1))
    } else last_day(add_months(d, n))
  }

  /** d + QuarterEnd(startingMonth=anchor, n): anchored quarter ends in
    * n's direction (on-anchor advances; negative n lands strictly
    * before d — the rollforward label minus 3|n| months). */
  def shiftQuarterEnd(d: Column, anchorMonth: Int, n: Int = 1): Column = {
    require(n != 0, "n must be nonzero")
    val qe = quarterEndLabel(d, anchorMonth)
    if (n > 0) {
      val first = when(d.cast("date") === qe, last_day(add_months(d, 3))).otherwise(qe)
      if (n == 1) first else last_day(add_months(first, 3 * (n - 1)))
    } else last_day(add_months(qe, 3 * n))
  }

  /** d + YearEnd(month=anchor, n): anchored year ends in n's direction. */
  def shiftYearEnd(d: Column, anchorMonth: Int, n: Int = 1): Column = {
    require(n != 0, "n must be nonzero")
    val ye = yearEndLabel(d, anchorMonth)
    if (n > 0) {
      val first = when(d.cast("date") === ye, last_day(add_months(d, 12))).otherwise(ye)
      if (n == 1) first else last_day(add_months(first, 12 * (n - 1)))
    } else last_day(add_months(ye, 12 * n))
  }

  /** n-th anchor weekday of d's month (n 1-based), as a date. */
  private def nthWeekdayOfMonth(monthStart: Column, anchorDow: Int, n: Int): Column =
    date_add(monthStart,
      (pmod(lit(anchorDow) - pandasDow(monthStart), lit(7)) + 7 * (n - 1)).cast("int"))

  /** d + WeekOfMonth(week, weekday): next "(week+1)-th <weekday> of the
    * month" strictly after d (pandas WeekOfMonth; week is 0-based). */
  def shiftWeekOfMonth(d: Column, week: Int, anchorDow: Int): Column = {
    require(week >= 0 && week <= 3, s"week 0..3: $week")
    require(anchorDow >= 0 && anchorDow <= 6, s"weekday 0..6: $anchorDow")
    val thisM = nthWeekdayOfMonth(trunc(d, "month"), anchorDow, week + 1)
    val nextM = nthWeekdayOfMonth(trunc(add_months(d, 1), "month"), anchorDow, week + 1)
    when(thisM > d.cast("date"), thisM).otherwise(nextM)
  }

  /** d + LastWeekOfMonth(weekday): next "last <weekday> of the month"
    * strictly after d. */
  def shiftLastWeekOfMonth(d: Column, anchorDow: Int): Column = {
    require(anchorDow >= 0 && anchorDow <= 6, s"weekday 0..6: $anchorDow")
    def lastIn(ld: Column): Column =
      date_sub(ld, pmod(pandasDow(ld) - lit(anchorDow), lit(7)).cast("int"))
    val thisM = lastIn(last_day(d))
    val nextM = lastIn(last_day(add_months(d, 1)))
    when(thisM > d.cast("date"), thisM).otherwise(nextM)
  }

  /** FY5253 (52-53-week retail calendar) year-end anchor for the fiscal
    * year whose anchor month falls in calendar year `y`:
    * variation='last' → last <weekday> of the month; 'nearest' → the
    * <weekday> nearest the month's last day. */
  private def fy5253Anchor(y: Column, anchorMonth: Int, anchorDow: Int,
      variation: String): Column = {
    val ld = last_day(make_date(y, lit(anchorMonth), lit(1)))
    val back = pmod(pandasDow(ld) - lit(anchorDow), lit(7))
    variation match {
      case "last" => date_sub(ld, back.cast("int"))
      case "nearest" =>
        when(back <= 3, date_sub(ld, back.cast("int")))
          .otherwise(date_add(ld, (lit(7) - back).cast("int")))
      case other => throw new IllegalArgumentException(
        s"variation must be last|nearest: $other")
    }
  }

  /** d + FY5253(weekday, startingMonth, variation): next 52/53-week
    * fiscal-year end strictly after d (pandas FY5253 — the retail
    * 4-5-4 calendar; reference offsets.py FY5253). */
  def shiftFY5253(d: Column, anchorDow: Int, anchorMonth: Int,
      variation: String): Column = {
    require(anchorDow >= 0 && anchorDow <= 6, s"weekday 0..6: $anchorDow")
    require(anchorMonth >= 1 && anchorMonth <= 12, s"month 1..12: $anchorMonth")
    // anchor(y-1) can still lie after d when the 'nearest' anchor of a
    // December-ending year spills into early January of year y
    val am = fy5253Anchor(year(d) - 1, anchorMonth, anchorDow, variation)
    val a0 = fy5253Anchor(year(d), anchorMonth, anchorDow, variation)
    val a1 = fy5253Anchor(year(d) + 1, anchorMonth, anchorDow, variation)
    when(am > d.cast("date"), am)
      .when(a0 > d.cast("date"), a0).otherwise(a1)
  }

  /** d + SemiMonthEnd(): next anchor in {15th, month end} strictly
    * after d (pandas SemiMonthEnd, day_of_month=15). */
  def shiftSemiMonthEnd(d: Column): Column = {
    val dd = d.cast("date")
    val fifteenth = date_add(trunc(d, "month"), 14)
    when(dayofmonth(d) < 15, fifteenth)
      .when(dd < last_day(d), last_day(d))
      .otherwise(date_add(trunc(add_months(d, 1), "month"), 14))
  }

  /** d + SemiMonthBegin(): next anchor in {1st, 15th} strictly after d. */
  def shiftSemiMonthBegin(d: Column): Column = {
    val fifteenth = date_add(trunc(d, "month"), 14)
    when(dayofmonth(d) < 15, fifteenth)
      .otherwise(trunc(add_months(d, 1), "month"))
  }

  /** Floor integer division by a positive constant. The double quotient
    * is correctly rounded and the smallest nonzero fractional part
    * (1/b) far exceeds 1 ulp at these magnitudes, so floor(a/b) cannot
    * land on the wrong integer. */
  private def idiv(a: Column, b: Long): Column = floor(a / b).cast("long")

  /** ts + BusinessHour(n): pandas BusinessHour — business time runs
    * 09:00-17:00 on weekdays; out-of-hours starts roll to the next
    * opening first. Implemented as a CONTINUOUS business-time axis:
    * micros-of-business-day within weekday ordinals (exact integer
    * arithmetic end-to-end), shift by n hours, invert. The 17:00 close
    * and the next 09:00 open are the same axis point, which reproduces
    * pandas exactly (16:00 + 1h lands on next-day 09:00, not 17:00). */
  def shiftBusinessHour(ts: Column, n: Int = 1): Column = {
    require(n >= 1, s"n >= 1: $n")
    val DAY = 86400000000L; val OPEN = 32400000000L; val BIZ = 28800000000L
    val us = unix_micros(ts)
    val eday = idiv(us, DAY)
    val m = eday + 3 // m = days since a Monday
    val w = pmod(m, lit(7)) // 0=Mon..6=Sun
    val usod = us - eday * DAY
    val busod = when(w <= 4,
      least(greatest(usod - OPEN, lit(0L)), lit(BIZ))).otherwise(lit(0L))
    val wd = lit(5L) * idiv(m, 7) + least(pmod(m, lit(7)), lit(5L)) // weekdays in [0,m)
    val b = wd * BIZ + busod + lit(n * 3600000000L)
    val dd = idiv(b, BIZ)
    val rem = b - dd * BIZ
    val eday2 = idiv(dd, 5) * 7 + pmod(dd, lit(5)) - 3
    timestamp_micros(eday2 * DAY + OPEN + rem)
  }

  /** d + CustomBusinessDay(holidays): next weekday strictly after d that
    * is neither a weekend nor a listed holiday (reference offsets.py
    * CustomBusinessDay; holiday calendars reduce to their date list).
    * The scan stays expression-only: the roll is unrolled to the worst
    * chain a weekend + the holiday list can form, so plan depth is
    * bounded by the calendar size, not the data. */
  def shiftBusinessDay(d: Column, holidays: Seq[String] = Nil): Column = {
    val isBusiness: Column => Column = c => {
      val weekday = !dayofweek(c).isin(1, 7)
      if (holidays.isEmpty) weekday
      else weekday && !c.cast("string").isInCollection(holidays)
    }
    val steps = 2 * holidays.size + 6
    def roll(c: Column, k: Int): Column =
      if (k == 0) c
      else when(isBusiness(c), c).otherwise(roll(date_add(c, 1), k - 1))
    roll(date_add(d.cast("date"), 1), steps)
  }

  /** Easter Sunday of year `y` by the anonymous Gregorian computus —
    * closed-form integer column arithmetic, no UDF (reference
    * offsets.py Easter, which delegates to dateutil's western
    * computus). */
  def easterOfYear(y: Column): Column = {
    val a = pmod(y, lit(19))
    val b = idiv(y, 100)
    val c = pmod(y, lit(100))
    val d0 = idiv(b, 4)
    val e = pmod(b, lit(4))
    val f = idiv(b + 8, 25)
    val g = idiv(b - f + 1, 3)
    val h = pmod(a * 19 + b - d0 - g + 15, lit(30))
    val i0 = idiv(c, 4)
    val k = pmod(c, lit(4))
    val l = pmod(lit(32) + e * 2 + i0 * 2 - h - k, lit(7))
    val m = idiv(a + h * 11 + l * 22, 451)
    val mon = idiv(h + l - m * 7 + 114, 31)
    val day = pmod(h + l - m * 7 + 114, lit(31)) + 1
    make_date(y.cast("int"), mon.cast("int"), day.cast("int"))
  }

  /** d + n·Easter(): pandas Easter offset — the n-th Easter STRICTLY
    * after d (n > 0) or strictly before (n < 0); an on-Easter date
    * advances a full period, like every anchored offset here.
    * Consecutive Easters are one per calendar year, so the n-th is the
    * first ± (|n| − 1) years. */
  def shiftEaster(d: Column, n: Int = 1): Column = {
    require(n != 0, "Easter offset with n == 0 is not a shift")
    val dd = d.cast("date")
    val y = year(dd)
    if (n > 0) {
      val y1 = when(easterOfYear(y) > dd, y).otherwise(y + 1)
      easterOfYear(y1 + (n - 1))
    } else {
      val y1 = when(easterOfYear(y) < dd, y).otherwise(y - 1)
      easterOfYear(y1 + (n + 1))
    }
  }

  /** Tick (fixed-duration) offset units: Day/Hour/Minute/Second/Milli/
    * Micro/Nano (reference pandas/tseries/offsets.py:2205-2366,
    * Tick._inc and the seven leaf classes :2333-2366). Unlike the
    * anchored offsets above, a Tick is pure interval arithmetic —
    * pandas applies `other + self.delta` — so Day here is the Tick Day:
    * exactly 24 hours, never calendar-aware (Spark's UTC TimestampType
    * axis has no DST, matching pandas tz-naive behavior). `prefix`
    * mirrors the pandas freqstr codes (D/H/T/S/L/U/N). */
  sealed abstract class TickUnit(val nanos: Long, val prefix: String)
  case object DayTick extends TickUnit(86400L * 1000000000L, "D")
  case object HourTick extends TickUnit(3600L * 1000000000L, "H")
  case object MinuteTick extends TickUnit(60L * 1000000000L, "T")
  case object SecondTick extends TickUnit(1000000000L, "S")
  case object MilliTick extends TickUnit(1000000L, "L")
  case object MicroTick extends TickUnit(1000L, "U")
  case object NanoTick extends TickUnit(1L, "N")

  private val tickUnits: Seq[TickUnit] = Seq(DayTick, HourTick, MinuteTick,
    SecondTick, MilliTick, MicroTick, NanoTick)

  /** ts + n·unit, closed-form micros arithmetic (codegen'd, no UDF).
    * Sub-microsecond remainders floor toward negative infinity at
    * Spark's microsecond timestamp precision — identical to the pandas
    * nanosecond-exact result floored to microseconds, so Nano ticks
    * stay pandas-consistent at the precision the engine can store
    * (DOCUMENTED DEVIATION: pandas keeps the ns remainder). */
  def shiftTick(ts: Column, unit: TickUnit, n: Long = 1): Column = {
    val micros = Math.floorDiv(Math.multiplyExact(unit.nanos, n), 1000L)
    timestamp_micros(unix_micros(ts) + micros)
  }

  /** pandas liboffsets._delta_to_tick (offsets.py:2369): the largest
    * tick unit representing `nanos` exactly, with its count. */
  def tickOf(nanos: Long): (TickUnit, Long) = {
    val u = tickUnits.find(u => nanos % u.nanos == 0).get
    (u, nanos / u.nanos)
  }

  /** pandas freqstr for n ticks of a unit: '3H', 'T', '500L', ... */
  def tickFreqStr(unit: TickUnit, n: Long = 1): String =
    (if (n == 1) "" else n.toString) + unit.prefix

  // ---- DuckDB transliterations (same arithmetic, oracle side) ----
  // DuckDB dayofweek(): 0=Sunday..6=Saturday => pandasDow = (dow+6) % 7.
  // DATE + INTEGER is day arithmetic; to_months() builds month intervals.

  def pandasDowSql(d: String): String = s"(dayofweek(CAST($d AS DATE)) + 6) % 7"

  def weekAnchorLabelSql(d: String, anchorDow: Int): String =
    s"CAST($d AS DATE) + CAST((($anchorDow - ${pandasDowSql(d)}) % 7 + 7) % 7 AS INTEGER)"

  def weekAnchorLabelBackSql(d: String, anchorDow: Int): String =
    s"CAST($d AS DATE) - CAST(((${pandasDowSql(d)} - $anchorDow) % 7 + 7) % 7 AS INTEGER)"

  def quarterEndLabelSql(d: String, anchorMonth: Int): String =
    s"last_day(CAST($d AS DATE) + to_months(CAST((($anchorMonth - month($d)) % 3 + 3) % 3 AS INTEGER)))"

  def yearEndLabelSql(d: String, anchorMonth: Int): String =
    s"last_day(CAST($d AS DATE) + to_months(CAST((($anchorMonth - month($d)) % 12 + 12) % 12 AS INTEGER)))"

  def shiftWeekSql(d: String, anchorDow: Int): String =
    s"CAST($d AS DATE) + CAST((($anchorDow - ${pandasDowSql(d)} - 1) % 7 + 7) % 7 + 1 AS INTEGER)"

  def shiftMonthBeginSql(d: String): String =
    s"CAST(date_trunc('month', CAST($d AS DATE) + to_months(1)) AS DATE)"

  def shiftMonthEndSql(d: String): String =
    s"""CASE WHEN CAST($d AS DATE) = last_day(CAST($d AS DATE))
       |  THEN last_day(CAST($d AS DATE) + to_months(1))
       |  ELSE last_day(CAST($d AS DATE)) END""".stripMargin

  def shiftQuarterEndSql(d: String, anchorMonth: Int): String =
    s"""CASE WHEN CAST($d AS DATE) = ${quarterEndLabelSql(d, anchorMonth)}
       |  THEN last_day(CAST($d AS DATE) + to_months(3))
       |  ELSE ${quarterEndLabelSql(d, anchorMonth)} END""".stripMargin

  def shiftYearEndSql(d: String, anchorMonth: Int): String =
    s"""CASE WHEN CAST($d AS DATE) = ${yearEndLabelSql(d, anchorMonth)}
       |  THEN last_day(CAST($d AS DATE) + to_months(12))
       |  ELSE ${yearEndLabelSql(d, anchorMonth)} END""".stripMargin

  def shiftWeekSql(d: String, anchorDow: Int, n: Int): String =
    if (n > 0)
      s"CAST($d AS DATE) + CAST((($anchorDow - ${pandasDowSql(d)} - 1) % 7 + 7) % 7 + 1 + ${7 * (n - 1)} AS INTEGER)"
    else
      s"CAST($d AS DATE) - CAST(((${pandasDowSql(d)} - $anchorDow - 1) % 7 + 7) % 7 + 1 + ${7 * (-n - 1)} AS INTEGER)"

  def shiftMonthBeginSql(d: String, n: Int): String =
    if (n > 0)
      s"CAST(date_trunc('month', CAST($d AS DATE) + to_months($n)) AS DATE)"
    else {
      val first = s"""CASE WHEN day(CAST($d AS DATE)) = 1
                     |  THEN CAST(date_trunc('month', CAST($d AS DATE) + to_months(-1)) AS DATE)
                     |  ELSE CAST(date_trunc('month', CAST($d AS DATE)) AS DATE) END""".stripMargin
      if (n == -1) first else s"CAST(($first) + to_months(${n + 1}) AS DATE)"
    }

  def shiftMonthEndSql(d: String, n: Int): String =
    if (n == 1) shiftMonthEndSql(d)
    else if (n > 1) s"last_day((${shiftMonthEndSql(d)}) + to_months(${n - 1}))"
    else s"last_day(CAST($d AS DATE) + to_months($n))"

  def shiftQuarterEndSql(d: String, anchorMonth: Int, n: Int): String =
    if (n == 1) shiftQuarterEndSql(d, anchorMonth)
    else if (n > 1) s"last_day((${shiftQuarterEndSql(d, anchorMonth)}) + to_months(${3 * (n - 1)}))"
    else s"last_day((${quarterEndLabelSql(d, anchorMonth)}) + to_months(${3 * n}))"

  def shiftYearEndSql(d: String, anchorMonth: Int, n: Int): String =
    if (n == 1) shiftYearEndSql(d, anchorMonth)
    else if (n > 1) s"last_day((${shiftYearEndSql(d, anchorMonth)}) + to_months(${12 * (n - 1)}))"
    else s"last_day((${yearEndLabelSql(d, anchorMonth)}) + to_months(${12 * n}))"

  def fiscalYearSql(d: String, anchorMonth: Int): String =
    s"year(${yearEndLabelSql(d, anchorMonth)})"

  def fiscalQuarterLabelSql(d: String, anchorMonth: Int): String = {
    val qe = qeCte(d, anchorMonth) // quarter-end date fragment
    val fy = s"last_day($qe + to_months(CAST((($anchorMonth - month($qe)) % 12 + 12) % 12 AS INTEGER)))"
    s"""concat(CAST(year($fy) AS VARCHAR), 'Q',
       |  CAST(4 - ((year($fy) * 12 + month($fy)) - (year($qe) * 12 + month($qe))) // 3 AS VARCHAR))""".stripMargin
  }

  private def qeCte(d: String, anchorMonth: Int): String =
    quarterEndLabelSql(d, anchorMonth)

  private def nthWeekdayOfMonthSql(monthStart: String, anchorDow: Int, n: Int): String =
    s"($monthStart) + CAST((($anchorDow - (dayofweek($monthStart) + 6) % 7) % 7 + 7) % 7 + ${7 * (n - 1)} AS INTEGER)"

  def shiftWeekOfMonthSql(d: String, week: Int, anchorDow: Int): String = {
    val thisM = nthWeekdayOfMonthSql(
      s"CAST(date_trunc('month', CAST($d AS DATE)) AS DATE)", anchorDow, week + 1)
    val nextM = nthWeekdayOfMonthSql(
      s"CAST(date_trunc('month', CAST($d AS DATE) + to_months(1)) AS DATE)", anchorDow, week + 1)
    s"CASE WHEN ($thisM) > CAST($d AS DATE) THEN ($thisM) ELSE ($nextM) END"
  }

  def shiftLastWeekOfMonthSql(d: String, anchorDow: Int): String = {
    def lastIn(ld: String): String =
      s"($ld) - CAST((((dayofweek($ld) + 6) % 7 - $anchorDow) % 7 + 7) % 7 AS INTEGER)"
    val thisM = lastIn(s"last_day(CAST($d AS DATE))")
    val nextM = lastIn(s"last_day(CAST($d AS DATE) + to_months(1))")
    s"CASE WHEN ($thisM) > CAST($d AS DATE) THEN ($thisM) ELSE ($nextM) END"
  }

  private def fy5253AnchorSql(y: String, anchorMonth: Int, anchorDow: Int,
      variation: String): String = {
    val ld = s"last_day(make_date($y, $anchorMonth, 1))"
    val back = s"(((dayofweek($ld) + 6) % 7 - $anchorDow) % 7 + 7) % 7"
    variation match {
      case "last" => s"($ld - CAST($back AS INTEGER))"
      case _ =>
        s"""(CASE WHEN $back <= 3 THEN $ld - CAST($back AS INTEGER)
           |  ELSE $ld + CAST(7 - ($back) AS INTEGER) END)""".stripMargin
    }
  }

  def shiftFY5253Sql(d: String, anchorDow: Int, anchorMonth: Int,
      variation: String): String = {
    val am = fy5253AnchorSql(s"CAST(year($d) - 1 AS INTEGER)", anchorMonth, anchorDow, variation)
    val a0 = fy5253AnchorSql(s"CAST(year($d) AS INTEGER)", anchorMonth, anchorDow, variation)
    val a1 = fy5253AnchorSql(s"CAST(year($d) + 1 AS INTEGER)", anchorMonth, anchorDow, variation)
    s"""CASE WHEN ($am) > CAST($d AS DATE) THEN ($am)
       |  WHEN ($a0) > CAST($d AS DATE) THEN ($a0) ELSE ($a1) END""".stripMargin
  }

  def shiftSemiMonthEndSql(d: String): String =
    s"""CASE WHEN day(CAST($d AS DATE)) < 15
       |  THEN CAST(date_trunc('month', CAST($d AS DATE)) AS DATE) + 14
       |  WHEN CAST($d AS DATE) < last_day(CAST($d AS DATE))
       |  THEN last_day(CAST($d AS DATE))
       |  ELSE CAST(date_trunc('month', CAST($d AS DATE) + to_months(1)) AS DATE) + 14
       |END""".stripMargin

  def shiftSemiMonthBeginSql(d: String): String =
    s"""CASE WHEN day(CAST($d AS DATE)) < 15
       |  THEN CAST(date_trunc('month', CAST($d AS DATE)) AS DATE) + 14
       |  ELSE CAST(date_trunc('month', CAST($d AS DATE) + to_months(1)) AS DATE)
       |END""".stripMargin

  /** Mirrors shiftBusinessHour exactly (DuckDB `//` is floor division;
    * every operand is a nonnegative integer, so `%` agrees with pmod). */
  def shiftBusinessHourSql(ts: String, n: Int): String = {
    val us = s"epoch_us($ts)"
    val eday = s"($us // 86400000000)"
    val m = s"($eday + 3)"
    val busod =
      s"""(CASE WHEN $m % 7 <= 4
         |  THEN least(greatest($us - $eday * 86400000000 - 32400000000, 0), 28800000000)
         |  ELSE 0 END)""".stripMargin
    val wd = s"(5 * ($m // 7) + least($m % 7, 5))"
    val b = s"($wd * 28800000000 + $busod + ${n.toLong * 3600000000L})"
    val dd = s"($b // 28800000000)"
    s"""make_timestamp(
       |  (($dd // 5) * 7 + $dd % 5 - 3) * 86400000000
       |  + 32400000000 + $b % 28800000000)""".stripMargin
  }

  /** Mirrors shiftBusinessDay: the same unrolled roll as nested CASE. */
  def shiftBusinessDaySql(d: String, holidays: Seq[String]): String = {
    def isB(c: String): String = {
      val wd = s"dayofweek($c) NOT IN (0, 6)"
      if (holidays.isEmpty) wd
      else wd +
        s" AND CAST($c AS VARCHAR) NOT IN (${holidays.map(h => s"'$h'").mkString(", ")})"
    }
    val steps = 2 * holidays.size + 6
    def roll(c: String, k: Int): String =
      if (k == 0) c
      else s"CASE WHEN ${isB(c)} THEN $c ELSE ${roll(s"($c + 1)", k - 1)} END"
    roll(s"(CAST($d AS DATE) + 1)", steps)
  }
}
