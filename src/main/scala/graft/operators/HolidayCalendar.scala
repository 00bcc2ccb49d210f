package graft.operators

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

/** Holiday calendar RULES → concrete date lists (reference:
  * pandas/tseries/holiday.py — Holiday(month, day, observance) /
  * Holiday(month, day_of_week, nth), AbstractHolidayCalendar.holidays).
  *
  * Calendars are tiny driver-side data: the generated ISO date list
  * feeds [[Offsets.shiftBusinessDay]] (and its SQL mirror) as plain
  * literals, so the cluster-side plan never changes shape with the
  * calendar — only the literal set does.
  */
object HolidayCalendar {

  sealed trait Rule

  /** Fixed month/day; observed = pandas nearest_workday (Sat→Fri,
    * Sun→Mon). `fromYear` gates rules that only exist from some year
    * (Juneteenth, 2021). */
  final case class FixedDate(month: Int, day: Int, observed: Boolean = true,
      fromYear: Int = 0) extends Rule

  /** n-th weekday of a month (weekday 0=Mon..6=Sun, pandas numbering);
    * n = -1 means the LAST such weekday of the month. */
  final case class NthWeekday(month: Int, weekday: Int, n: Int) extends Rule

  /** Easter Sunday + offset days (pandas Easter offset / the
    * GoodFriday(-2) and EasterMonday(+1) holiday rules). */
  final case class EasterOffset(days: Int = 0) extends Rule

  /** Gregorian computus (the anonymous Gauss algorithm — the same one
    * dateutil/pandas use). */
  def easterSunday(year: Int): LocalDate = {
    val a = year % 19; val b = year / 100; val c = year % 100
    val d = b / 4; val e = b % 4; val f = (b + 8) / 25
    val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4; val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day = (h + l - 7 * m + 114) % 31 + 1
    LocalDate.of(year, month, day)
  }

  private def nearestWorkday(d: LocalDate): LocalDate = d.getDayOfWeek match {
    case DayOfWeek.SATURDAY => d.minusDays(1)
    case DayOfWeek.SUNDAY => d.plusDays(1)
    case _ => d
  }

  private def resolve(rule: Rule, year: Int): Option[LocalDate] = rule match {
    case FixedDate(m, day, obs, from) =>
      if (year < from) None
      else {
        val d = LocalDate.of(year, m, day)
        Some(if (obs) nearestWorkday(d) else d)
      }
    case NthWeekday(m, wd, n) =>
      val dow = DayOfWeek.of(wd + 1) // pandas 0=Mon..6=Sun → java 1..7
      val d =
        if (n == -1) LocalDate.of(year, m, 1).`with`(TemporalAdjusters.lastInMonth(dow))
        else LocalDate.of(year, m, 1).`with`(TemporalAdjusters.dayOfWeekInMonth(n, dow))
      Some(d)
    case EasterOffset(days) => Some(easterSunday(year).plusDays(days.toLong))
  }

  /** Sorted ISO dates for `rules` whose OBSERVED date falls in
    * [start, end] (inclusive, ISO strings) — pandas
    * AbstractHolidayCalendar.holidays semantics. */
  def dates(rules: Seq[Rule], start: String, end: String): Seq[String] = {
    val s = LocalDate.parse(start)
    val e = LocalDate.parse(end)
    (s.getYear - 1 to e.getYear + 1).flatMap { y =>
      rules.flatMap(r => resolve(r, y))
    }.filter(d => !d.isBefore(s) && !d.isAfter(e))
      .map(_.toString).distinct.sorted
  }

  /** pandas USFederalHolidayCalendar (tseries/holiday.py:512). */
  val usFederal: Seq[Rule] = Seq(
    FixedDate(1, 1), // New Year's Day (observed)
    NthWeekday(1, 0, 3), // Martin Luther King Jr. Day
    NthWeekday(2, 0, 3), // Presidents' Day
    NthWeekday(5, 0, -1), // Memorial Day (last Monday of May)
    FixedDate(6, 19, observed = true, fromYear = 2021), // Juneteenth
    FixedDate(7, 4), // Independence Day
    NthWeekday(9, 0, 1), // Labor Day
    NthWeekday(10, 0, 2), // Columbus Day
    FixedDate(11, 11), // Veterans Day
    NthWeekday(11, 3, 4), // Thanksgiving (4th Thursday of November)
    FixedDate(12, 25)) // Christmas
}
