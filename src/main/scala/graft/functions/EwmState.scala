package graft.functions

/** Segment-compressed exponentially-weighted moment state — the
  * 100 TB-safe buffer shared by [[EwmAggregator]] and
  * [[EwmMomentsAggregator]] (reference kernel pandas/_libs/window.pyx
  * :1732 ewma / :1802 ewmcov, which stream in index order on one core;
  * this is the distributed equivalent).
  *
  * Groups at or below [[flushAt]] rows stay in an exact raw buffer and
  * finish through the original position-sorted two-pass evaluation —
  * byte-identical results to the pre-segment implementation. Beyond
  * that, position-sorted runs are compressed into O(1)-size segments:
  *
  *   - weights inside a segment are geometric with the NEWEST element's
  *     weight 1 and each step back ×r (never overflows, any length);
  *   - moment sums are centered on the segment's OLDEST (x, y) so the
  *     one-pass combine does not cancel catastrophically;
  *   - combining an older segment with `m` newer observations multiplies
  *     the older weight sums by r^m (r^2m for the squared-weight sum) —
  *     an O(1) merge, so per-group memory is O(#partitions + flushAt)
  *     instead of O(group length).
  *
  * Segments can only be combined in position order. Compaction therefore
  * refuses to fold raw rows that sit BELOW an existing segment's range
  * (the buffer then simply grows, degrading to the exact path rather
  * than corrupting state), and `total` throws if two compressed ranges
  * interleave — reachable only when a single group exceeds flushAt rows
  * per partition AND partitions hold interleaved position ranges; sort
  * within partitions (or repartition by group) first, which every engine
  * call site already does.
  */
object EwmState {

  /** Observations in position range [lo, hi]; sums use geometric weights
    * (newest = 1) centered at (cx, cy) = the segment's oldest values. */
  final case class Seg(lo: Long, hi: Long, cnt: Long,
      sw: Double, sw2: Double, swx: Double, swy: Double,
      swxx: Double, swyy: Double, swxy: Double, cx: Double, cy: Double)

  /** `rawMin`/`segMaxHi` are O(1)-maintained summaries of raw positions
    * and compressed ranges so [[compact]] can detect (and bail from) the
    * out-of-order degraded case without sorting the raw buffer — without
    * them a degraded group past flushAt would re-sort the whole growing
    * buffer on EVERY append (O(n² log n) for the group). */
  final case class Buf(segs: Seq[Seg], raw: Seq[(Long, Double, Double)],
      rawMin: Long = Long.MaxValue, segMaxHi: Long = Long.MinValue)

  val empty: Buf = Buf(Vector.empty, Vector.empty)

  /** Raw-buffer threshold: below this a group never compresses (exact
    * legacy path); above it memory stays bounded for sorted arrivals. */
  val flushAt: Int = 4096

  def singleton(pos: Long, x: Double, y: Double): Seg =
    Seg(pos, pos, 1L, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, x, y)

  /** One segment from position-sorted rows (oldest first): streaming
    * update sums ← sums·r + contribution, newest ends at weight 1. */
  def fromSorted(r: Double, rows: IndexedSeq[(Long, Double, Double)]): Seg = {
    val cx = rows.head._2; val cy = rows.head._3
    var sw = 0.0; var sw2 = 0.0; var swx = 0.0; var swy = 0.0
    var swxx = 0.0; var swyy = 0.0; var swxy = 0.0
    var i = 0
    while (i < rows.length) {
      val dx = rows(i)._2 - cx; val dy = rows(i)._3 - cy
      sw = sw * r + 1.0; sw2 = sw2 * r * r + 1.0
      swx = swx * r + dx; swy = swy * r + dy
      swxx = swxx * r + dx * dx; swyy = swyy * r + dy * dy
      swxy = swxy * r + dx * dy
      i += 1
    }
    Seg(rows.head._1, rows.last._1, rows.length.toLong,
      sw, sw2, swx, swy, swxx, swyy, swxy, cx, cy)
  }

  /** Combine `a` (entirely older) with `b` (entirely newer): recenter b
    * onto a's center exactly, then scale a's sums by r^(b.cnt). */
  def combine(r: Double, a: Seg, b: Seg): Seg = {
    val dx = b.cx - a.cx; val dy = b.cy - a.cy
    val bswx = b.swx + b.sw * dx
    val bswy = b.swy + b.sw * dy
    val bswxx = b.swxx + 2 * dx * b.swx + dx * dx * b.sw
    val bswyy = b.swyy + 2 * dy * b.swy + dy * dy * b.sw
    val bswxy = b.swxy + dx * b.swy + dy * b.swx + dx * dy * b.sw
    val f = math.pow(r, b.cnt.toDouble) // b.cnt newer obs push a back
    Seg(a.lo, b.hi, a.cnt + b.cnt,
      a.sw * f + b.sw, a.sw2 * f * f + b.sw2,
      a.swx * f + bswx, a.swy * f + bswy,
      a.swxx * f + bswxx, a.swyy * f + bswyy, a.swxy * f + bswxy,
      a.cx, a.cy)
  }

  def reduce(r: Double, b: Buf, pos: Long, x: Double, y: Double): Buf = {
    val raw2 = b.raw :+ ((pos, x, y))
    val rawMin2 = math.min(b.rawMin, pos)
    if (raw2.length < flushAt) b.copy(raw = raw2, rawMin = rawMin2)
    else compact(r, Buf(b.segs, raw2, rawMin2, b.segMaxHi))
  }

  /** Fold the raw tail into a fresh segment when every raw position lies
    * beyond the last compressed range; otherwise leave raw growing (the
    * exact path) rather than corrupt compressed state. The degraded-case
    * bail reads the O(1) `rawMin`/`segMaxHi` summaries — no sort, so a
    * degraded group's reduce stays an O(1)-amortized append. */
  def compact(r: Double, b: Buf): Buf = {
    if (b.raw.isEmpty) return b
    // compare against the MAX hi — within one partial buffer segments are
    // appended in increasing ranges, but a buffer that has been merged
    // holds them in concatenation order
    if (b.segs.nonEmpty && b.rawMin < b.segMaxHi) return b
    val sorted = b.raw.sortBy(_._1).toIndexedSeq
    val seg = fromSorted(r, sorted)
    Buf(b.segs :+ seg, Vector.empty,
      Long.MaxValue, math.max(b.segMaxHi, seg.hi))
  }

  /** Partial buffers merge by concatenation; position order (and the
    * interleave check) is restored once, at finish. */
  def merge(b1: Buf, b2: Buf): Buf =
    Buf(b1.segs ++ b2.segs, b1.raw ++ b2.raw,
      math.min(b1.rawMin, b2.rawMin), math.max(b1.segMaxHi, b2.segMaxHi))

  /** Collapse to one segment covering the whole group, or None if empty. */
  def total(r: Double, b: Buf): Option[Seg] = {
    val pieces = (b.segs ++ b.raw.map(t => singleton(t._1, t._2, t._3)))
      .sortBy(s => (s.lo, s.hi))
    if (pieces.isEmpty) return None
    pieces.sliding(2).foreach {
      case Seq(p, n) if n.lo < p.hi =>
        throw new IllegalStateException(
          s"EWM compressed position ranges interleave ([${p.lo},${p.hi}] vs " +
            s"[${n.lo},${n.hi}]); groups beyond $flushAt rows must arrive " +
            "position-sorted within partitions (repartition by group or " +
            "sortWithinPartitions first)")
      case _ => ()
    }
    Some(pieces.reduceLeft(combine(r, _, _)))
  }
}
