package graft.core

import graft.operators.Offsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pandas.Grouper(key=, freq=) — the unified time-grouping spelling
  * (reference: pandas/core/groupby/grouper.py:30; `df.groupby(
  * Grouper(freq='1H'))` ≡ `df.resample('1H')`). The freq rule maps to a
  * bucket COLUMN, so `groupby(Grouper(...), extraKeys)` is an ordinary
  * hash aggregation — the same one-shuffle plan as grouped resample.
  *
  * Supported rules: plain durations in pandas ('1H', '5min', '30S',
  * '2D') or Spark ('1 hour') spelling; anchored 'W-<DAY>' / 'Q-<MON>' /
  * 'A-<MON>' via [[Offsets]] (labels = period end by date, the pandas
  * default for those rules); month 'M'/'ME' (month end) and 'MS'
  * (month start).
  */
final case class Grouper(key: String, freq: String)

object Grouper {

  private val dowIdx = Seq("MON", "TUE", "WED", "THU", "FRI", "SAT", "SUN")
  private val monIdx = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")

  private val plainRe = "^(\\d+)\\s*(H|h|min|T|S|s|D|d)$".r

  /** Spark duration string for a pandas plain-frequency rule. */
  def duration(freq: String): String = freq match {
    case f if f.contains(" ") => f // already a Spark duration
    case plainRe(n, u) =>
      val unit = u match {
        case "H" | "h" => "hours"
        case "min" | "T" => "minutes"
        case "S" | "s" => "seconds"
        case "D" | "d" => "days"
      }
      s"$n $unit"
    case other => throw new IllegalArgumentException(s"unsupported freq: $other")
  }

  /** The bucket label column for `freq` over timestamp column `ts`. */
  def bucket(ts: Column, freq: String): Column = freq match {
    case f if f.startsWith("W-") =>
      val i = dowIdx.indexOf(f.drop(2).toUpperCase)
      require(i >= 0, s"unknown weekday anchor: $f")
      Offsets.weekAnchorLabel(to_date(ts), i)
    case f if f.startsWith("Q-") =>
      val i = monIdx.indexOf(f.drop(2).toUpperCase)
      require(i >= 0, s"unknown month anchor: $f")
      Offsets.quarterEndLabel(ts, i + 1)
    case f if f.startsWith("A-") || f.startsWith("Y-") =>
      val i = monIdx.indexOf(f.drop(2).toUpperCase)
      require(i >= 0, s"unknown month anchor: $f")
      Offsets.yearEndLabel(ts, i + 1)
    case "M" | "ME" => last_day(ts)
    case "MS" => date_trunc("month", ts)
    case plain => window(ts, duration(plain)).getField("start")
  }
}
