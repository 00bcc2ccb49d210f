package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** ewm(alpha).cov(y) / .var() / .corr(y) as a typed Aggregator
  * (reference kernel pandas/_libs/window.pyx:1802 ewmcov; API
  * pandas/core/window.py EWM.var/cov/corr).
  *
  * The weight vector follows pandas:
  *
  *   adjust=true:  w_i = r^(n-1-i)                    (r = 1-α)
  *   adjust=false: w_0 = r^(n-1), w_i = α·r^(n-1-i)   (i > 0)
  *
  * and the estimator is the weighted co-moment around the weighted means,
  * de-biased by (Σw)²/((Σw)²−Σw²) when bias=false. `stat` selects the
  * output: cov (default), var (y ignored, cov(x,x)), or corr (bias factor
  * cancels).
  *
  * Memory is scale-safe via [[EwmState]]: groups at or below
  * EwmState.flushAt rows buffer (pos, x, y) exactly and finish with the
  * original position-sorted two-pass evaluation (unchanged results);
  * longer position-sorted groups compress into O(1) segments with an
  * O(1) positional merge, so a 10⁸-event key aggregates under fixed heap
  * instead of materializing the whole group at finish. Weights are
  * geometric from the newest element backwards in both paths, so r^k
  * never overflows — safe for arbitrarily long groups, unlike the
  * closed-form SQL window (RollingOps.ewmaAdjusted) which is bounded by
  * pow's exponent range.
  */
/** ewm parameterizations (reference pandas/core/window.py _get_alpha):
  * com/span/halflife are alternate spellings of alpha. */
object EwmParams {
  def fromCom(com: Double): Double = { require(com >= 0); 1.0 / (1.0 + com) }
  def fromSpan(span: Double): Double = { require(span >= 1); 2.0 / (span + 1.0) }
  def fromHalflife(hl: Double): Double = {
    require(hl > 0); 1.0 - math.exp(-math.log(2.0) / hl)
  }
}

class EwmMomentsAggregator(alpha: Double, adjust: Boolean = true,
    bias: Boolean = false, stat: String = "cov")
    extends Aggregator[(Long, Double, Double), EwmState.Buf, Double] {

  // alpha = 1 is legal (com=0 / span=1: all weight on the newest obs;
  // the unbiased de-noising then yields NaN via den <= 0, correctly)
  require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
  require(Seq("cov", "var", "corr").contains(stat), s"unknown stat: $stat")

  private val r = 1.0 - alpha

  override def zero: EwmState.Buf = EwmState.empty

  override def reduce(b: EwmState.Buf, a: (Long, Double, Double)): EwmState.Buf =
    EwmState.reduce(r, b, a._1, a._2, a._3)

  override def merge(b1: EwmState.Buf, b2: EwmState.Buf): EwmState.Buf =
    EwmState.merge(b1, b2)

  override def finish(buf: EwmState.Buf): Double =
    if (buf.segs.isEmpty) finishExact(buf.raw)
    else EwmState.total(r, buf).map(finishSegment).getOrElse(Double.NaN)

  /** Short-group path: the original exact two-pass evaluation over the
    * position-sorted raw buffer (identical results to pre-segment code). */
  private def finishExact(raw: Seq[(Long, Double, Double)]): Double = {
    if (raw.length < 2) return Double.NaN
    val sorted = raw.sortBy(_._1).toArray
    val n = sorted.length
    // back-to-front: weight of the latest obs is 1 (adjust) or α; each
    // step back multiplies by r — no r^(n) blowup for long groups.
    val w = new Array[Double](n)
    var acc = if (adjust) 1.0 else alpha
    var i = n - 1
    while (i >= 0) {
      w(i) = acc
      acc *= r
      i -= 1
    }
    if (!adjust) w(0) = w(0) / alpha // first obs keeps full r^(n-1)
    var sw = 0.0; var sw2 = 0.0; var swx = 0.0; var swy = 0.0
    i = 0
    while (i < n) {
      sw += w(i); sw2 += w(i) * w(i)
      swx += w(i) * sorted(i)._2; swy += w(i) * sorted(i)._3
      i += 1
    }
    val mx = swx / sw; val my = swy / sw
    var cxy = 0.0; var cxx = 0.0; var cyy = 0.0
    i = 0
    while (i < n) {
      val dx = sorted(i)._2 - mx; val dy = sorted(i)._3 - my
      cxy += w(i) * dx * dy; cxx += w(i) * dx * dx; cyy += w(i) * dy * dy
      i += 1
    }
    emit(sw, sw2, cxx, cyy, cxy)
  }

  /** Long-group path: moments from the collapsed segment's centered
    * one-pass sums. The segment's center is the group's OLDEST (x, y),
    * which is exactly the element whose adjust=false weight differs —
    * its centered contribution to the linear sums is zero, so only
    * Σw / Σw² need the first-element correction. */
  private def finishSegment(t: EwmState.Seg): Double = {
    if (t.cnt < 2) return Double.NaN
    val p = math.pow(r, (t.cnt - 1).toDouble) // oldest element's geometric weight
    val (sw, sw2, swx, swy, swxx, swyy, swxy) =
      if (adjust) (t.sw, t.sw2, t.swx, t.swy, t.swxx, t.swyy, t.swxy)
      else (alpha * t.sw + (1 - alpha) * p,
        alpha * alpha * t.sw2 + (1 - alpha * alpha) * p * p,
        alpha * t.swx, alpha * t.swy,
        alpha * t.swxx, alpha * t.swyy, alpha * t.swxy)
    val mx = swx / sw; val my = swy / sw
    val cxx = swxx - swx * mx
    val cyy = swyy - swy * my
    val cxy = swxy - swx * my
    emit(sw, sw2, cxx, cyy, cxy)
  }

  private def emit(sw: Double, sw2: Double, cxx: Double, cyy: Double,
      cxy: Double): Double = stat match {
    case "corr" =>
      if (cxx > 0 && cyy > 0) cxy / math.sqrt(cxx * cyy) else Double.NaN
    case _ =>
      val biased = (if (stat == "var") cxx else cxy) / sw
      if (bias) biased
      else {
        val den = sw * sw - sw2
        if (den > 0) biased * (sw * sw) / den else Double.NaN
      }
  }

  override def bufferEncoder: Encoder[EwmState.Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
