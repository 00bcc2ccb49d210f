package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Rolling / expanding / EWM window builders (SURVEY §2.5; reference:
  * pandas/core/window.py:48 — FixedWindowIndexer window.pyx:155,
  * VariableWindowIndexer :200 for time-based, ewma kernel :1732).
  *
  * Every spec is (partition keys, deterministic order): one shuffle on the
  * keys, ordered within partitions. An empty `groups` means a global
  * window — a documented single-partition hazard reserved for small or
  * benchmark-shaped inputs; production paths pass keys.
  */
object RollingOps {

  def ordered(groups: Seq[String], order: Seq[Column]): WindowSpec =
    (if (groups.isEmpty) Window.partitionBy()
     else Window.partitionBy(groups.map(col): _*))
      .orderBy(order.map(_.asc): _*)

  /** rolling(n): n-row trailing frame [-(n-1), 0]. */
  def fixed(groups: Seq[String], order: Seq[Column], n: Int): WindowSpec =
    ordered(groups, order).rowsBetween(-(n - 1).toLong, 0)

  /** rolling('10min')-style time window: pandas closed='right' default is
    * the half-open interval (t - width, t], realized as an inclusive
    * range frame of width-1 on the microsecond axis. */
  def timeRange(groups: Seq[String], tsOrderMicros: Column, widthMicros: Long): WindowSpec =
    (if (groups.isEmpty) Window.partitionBy()
     else Window.partitionBy(groups.map(col): _*))
      .orderBy(tsOrderMicros.asc)
      .rangeBetween(-(widthMicros - 1), 0)

  /** expanding(): everything up to the current row. */
  def expanding(groups: Seq[String], order: Seq[Column]): WindowSpec =
    ordered(groups, order).rowsBetween(Window.unboundedPreceding, 0)

  /** min_periods guard: null until `p` observations are in the frame. */
  def withMinPeriods(agg: Column, c: Column, w: WindowSpec, p: Int): Column =
    when(count(c).over(w) >= p, agg).otherwise(lit(null))

  /** ewm(alpha, adjust=true).mean() as a closed form over a running
    * window (reference kernel window.pyx:1732 ewma):
    *
    *   y_t = Σ_{i≤t} x_i (1-α)^(t-i) / Σ_{i≤t} (1-α)^(t-i)
    *       = Σ x_i r^(-i) / Σ r^(-i)          (r = 1-α; the r^t scale
    *                                           cancels in the ratio)
    *
    * `pos` is the 0-based position within the partition (row_number - 1).
    * Numerics: r^(-i) grows as e^(i·|ln r|) — fine for partitions up to
    * a few thousand rows; longer series should use the sequential
    * per-group Aggregator (see streaming/state ops) which is O(1) in
    * magnitude. This closed form exists because SQL windows cannot
    * express the recurrence directly.
    */
  def ewmaAdjusted(x: Column, pos: Column, alpha: Double,
      groups: Seq[String], order: Seq[Column]): Column = {
    val r = 1.0 - alpha
    val w = expanding(groups, order)
    val weight = pow(lit(r), -pos)
    sum(x * weight).over(w) / sum(weight).over(w)
  }
}
