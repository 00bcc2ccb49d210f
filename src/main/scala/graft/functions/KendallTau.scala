package graft.functions

/** Kendall τ-b via Knight's O(n log n) algorithm (merge-sort swap
  * counting) — the reference computes corr(method='kendall') with an
  * O(n²) pairwise kernel (pandas/core/nanops.py:1066); this is the
  * scalable per-group form used from flatMapGroups (one shuffle on the
  * group key, O(n log n) per group, exact integer counts).
  *
  * τ-b = (P − Q) / √((n0 − n1)(n0 − n2)) with
  *   n0 = n(n−1)/2, n1/n2 = Σ tᵢ(tᵢ−1)/2 over x-/y-tie groups,
  *   n3 = joint-tie pairs, Q = swaps of the y sequence after sorting by
  *   (x, y), P − Q = n0 − n1 − n2 + n3 − 2·swaps.
  * All counts stay integral; the only floating-point ops are the final
  * division by the product of two square roots (mirrored verbatim in
  * the DuckDB oracle SQL).
  */
object KendallTau {

  private def tiePairs[K](sorted: Array[K]): Long = {
    var total = 0L; var run = 1L; var i = 1
    while (i < sorted.length) {
      if (sorted(i) == sorted(i - 1)) run += 1
      else { total += run * (run - 1) / 2; run = 1 }
      i += 1
    }
    total + run * (run - 1) / 2
  }

  /** Bottom-up merge sort counting swaps (= discordant pairs when the
    * input is the y sequence ordered by (x asc, y asc)). */
  private def countSwaps(a: Array[Long]): Long = {
    val n = a.length
    val buf = new Array[Long](n)
    var src = a.clone(); var dst = buf
    var swaps = 0L
    var width = 1
    while (width < n) {
      var lo = 0
      while (lo < n) {
        val mid = math.min(lo + width, n)
        val hi = math.min(lo + 2 * width, n)
        var i = lo; var j = mid; var k = lo
        while (i < mid && j < hi) {
          if (src(i) <= src(j)) { dst(k) = src(i); i += 1 }
          else { dst(k) = src(j); j += 1; swaps += mid - i }
          k += 1
        }
        while (i < mid) { dst(k) = src(i); i += 1; k += 1 }
        while (j < hi) { dst(k) = src(j); j += 1; k += 1 }
        lo = hi
      }
      val t = src; src = dst; dst = t
      width *= 2
    }
    swaps
  }

  /** τ-b of exact integer-valued observations; None when undefined
    * (n < 2 or a fully-tied axis), matching the oracle's NULL. */
  def tauB(xs: Array[Long], ys: Array[Long]): Option[Double] = {
    val n = xs.length
    if (n < 2) return None
    val idx = Array.range(0, n).sortBy(i => (xs(i), ys(i)))
    val sx = idx.map(xs)
    val sy = idx.map(ys)
    val n0 = n.toLong * (n - 1) / 2
    val n1 = tiePairs(sx)
    val n3 = tiePairs(idx.map(i => (xs(i), ys(i))))
    val swaps = countSwaps(sy.clone())
    val n2 = tiePairs(sy.sorted)
    val d1 = n0 - n1; val d2 = n0 - n2
    if (d1 == 0L || d2 == 0L) None
    else {
      val pq = n0 - n1 - n2 + n3 - 2 * swaps
      Some(pq.toDouble / (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble)))
    }
  }
}
