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

  // ---- shifts (d + offset: on-anchor advances one full period) ----

  /** d + Week(weekday=anchor): next anchor weekday STRICTLY after d. */
  def shiftWeek(d: Column, anchorDow: Int): Column = {
    require(anchorDow >= 0 && anchorDow <= 6, s"weekday 0..6: $anchorDow")
    date_add(d, (pmod(lit(anchorDow) - pandasDow(d) - 1, lit(7)) + 1).cast("int"))
  }

  /** d + MonthBegin(1): first day of the next month (pandas MonthBegin
    * rolls any date, including a month start, to the NEXT month's 1st). */
  def shiftMonthBegin(d: Column): Column =
    trunc(add_months(d, 1), "month")

  /** d + MonthEnd(1): this month's last day, unless d already is it —
    * then next month's last day. */
  def shiftMonthEnd(d: Column): Column = {
    val dd = d.cast("date")
    when(dd === last_day(d), last_day(add_months(d, 1))).otherwise(last_day(d))
  }

  /** d + QuarterEnd(startingMonth=anchor): anchored quarter end strictly
    * after-or-at d, advancing a quarter when d is already on it. */
  def shiftQuarterEnd(d: Column, anchorMonth: Int): Column = {
    val qe = quarterEndLabel(d, anchorMonth)
    when(d.cast("date") === qe, last_day(add_months(d, 3))).otherwise(qe)
  }

  /** d + YearEnd(month=anchor): anchored year end, advancing a year when
    * d is already on it. */
  def shiftYearEnd(d: Column, anchorMonth: Int): Column = {
    val ye = yearEndLabel(d, anchorMonth)
    when(d.cast("date") === ye, last_day(add_months(d, 12))).otherwise(ye)
  }

  // ---- DuckDB transliterations (same arithmetic, oracle side) ----
  // DuckDB dayofweek(): 0=Sunday..6=Saturday => pandasDow = (dow+6) % 7.
  // DATE + INTEGER is day arithmetic; to_months() builds month intervals.

  def pandasDowSql(d: String): String = s"(dayofweek(CAST($d AS DATE)) + 6) % 7"

  def weekAnchorLabelSql(d: String, anchorDow: Int): String =
    s"CAST($d AS DATE) + CAST((($anchorDow - ${pandasDowSql(d)}) % 7 + 7) % 7 AS INTEGER)"

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
}
