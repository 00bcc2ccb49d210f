package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** ewm(alpha, adjust=false).mean() as a custom typed Aggregator
  * (SURVEY §4 custom work #2; reference kernel pandas/_libs/window.pyx
  * :1732 ewma) — the recurrence y ← (1−α)·y + α·x is inherently
  * sequential over the position order.
  *
  * Scale behavior via [[EwmState]]: groups at or below EwmState.flushAt
  * rows buffer (pos, value) exactly and run the recurrence at finish
  * (identical results to the pre-segment implementation); longer
  * position-sorted groups compress into O(1) segments, keeping per-group
  * memory bounded at any length. The recurrence's fixed point equals the
  * adjust=false weighted mean (weights sum to 1), which the segment path
  * evaluates from its centered geometric sums. Registered via
  * `functions.udaf` this also works from SQL.
  */
class EwmAggregator(alpha: Double)
    extends Aggregator[(Long, Double), EwmState.Buf, Double] {

  require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")

  private val r = 1.0 - alpha

  override def zero: EwmState.Buf = EwmState.empty

  override def reduce(b: EwmState.Buf, a: (Long, Double)): EwmState.Buf =
    EwmState.reduce(r, b, a._1, a._2, 0.0)

  override def merge(b1: EwmState.Buf, b2: EwmState.Buf): EwmState.Buf =
    EwmState.merge(b1, b2)

  override def finish(buf: EwmState.Buf): Double =
    if (buf.segs.isEmpty) {
      // short-group exact path: the original sequential recurrence
      if (buf.raw.isEmpty) Double.NaN
      else {
        val sorted = buf.raw.sortBy(_._1)
        var y = sorted.head._2
        var i = 1
        while (i < sorted.length) {
          y = r * y + alpha * sorted(i)._2
          i += 1
        }
        y
      }
    } else EwmState.total(r, buf).map { t =>
      // adjust=false weighted mean around the oldest element's value:
      // numerator correction vanishes (centered first element), the
      // denominator is α·Σw_geom + (1−α)·r^(n−1) — exactly 1 in real
      // arithmetic, evaluated explicitly for FP consistency.
      val p = math.pow(r, (t.cnt - 1).toDouble)
      t.cx + alpha * t.swx / (alpha * t.sw + (1 - alpha) * p)
    }.getOrElse(Double.NaN)

  override def bufferEncoder: Encoder[EwmState.Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
