package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** scipy.signal-compatible symmetric window weight generators backing
  * pandas' `rolling(win_type=...)` (reference: pandas/core/window.py:434
  * validates win_type against scipy.signal; kernel window.pyx:1664
  * roll_window applies the weight vector).
  *
  * Transcendental weights (hamming/blackman/gaussian) are computed ONCE
  * on the driver and shipped into the plan as double literals: executors
  * — and any differential oracle engine — then run identical ordered
  * IEEE arithmetic. Evaluating cos/exp per row instead would diverge
  * across libm implementations at 1 ULP and break hash-exact compares.
  *
  * Fidelity note: hamming/blackman use the textbook cosine series at
  * arguments 2πn/(M−1); scipy evaluates its general_cosine form at
  * linspace(−π,π) arguments, which differs from this at ~1 ULP for some
  * (M, n). Both engines here receive the SAME literals so parity is
  * unaffected — only bit-compatibility with scipy's exact output is
  * approximate.
  */
object WindowWeights {

  /** boxcar(M): all ones — the unweighted mean expressed as a win_type. */
  def boxcar(m: Int): Seq[Double] = Seq.fill(m)(1.0)

  /** triang(M), scipy sym=True: odd M peaks at 1, even M plateaus. */
  def triang(m: Int): Seq[Double] = {
    val half = (m + 1) / 2
    val up = (1 to half).map { k =>
      if (m % 2 == 1) 2.0 * k / (m + 1) else (2.0 * k - 1) / m
    }
    if (m % 2 == 1) up ++ up.reverse.tail else up ++ up.reverse
  }

  /** bartlett(M): triangular with zero endpoints — exact dyadic weights
    * for odd M (0, 1/2, 1, ...), so the dot product can stay exact.
    * M=1 is scipy's special case [1.0] (the series would be 0/0). */
  def bartlett(m: Int): Seq[Double] =
    if (m == 1) Seq(1.0)
    else (0 until m).map(n => 1.0 - math.abs(2.0 * n / (m - 1) - 1.0))

  /** hamming(M): 0.54 − 0.46·cos(2πn/(M−1)); hamming(1) = [1.0]. */
  def hamming(m: Int): Seq[Double] =
    if (m == 1) Seq(1.0)
    else (0 until m).map(n => 0.54 - 0.46 * math.cos(2 * math.Pi * n / (m - 1)))

  /** blackman(M): 0.42 − 0.5·cos(2πn/(M−1)) + 0.08·cos(4πn/(M−1));
    * blackman(1) = [1.0]. */
  def blackman(m: Int): Seq[Double] =
    if (m == 1) Seq(1.0)
    else (0 until m).map { n =>
      val x = 2 * math.Pi * n / (m - 1)
      0.42 - 0.5 * math.cos(x) + 0.08 * math.cos(2 * x)
    }

  /** gaussian(M, std): exp(−½((n−(M−1)/2)/std)²). */
  def gaussian(m: Int, std: Double): Seq[Double] =
    (0 until m).map(n => math.exp(-0.5 * math.pow((n - (m - 1) / 2.0) / std, 2)))

  /** Modified Bessel I₀ via its power series Σ ((x/2)^k / k!)² — the
    * standard evaluation (numpy.i0 agrees to ~1 ULP); terms fall below
    * machine epsilon after ~x/2 + 20 iterations for window-sized β. */
  def besselI0(x: Double): Double = {
    val h = x / 2.0
    var term = 1.0
    var sum = 1.0
    var k = 1
    while (term > sum * 1e-18 && k < 1000) {
      term *= (h / k) * (h / k)
      sum += term
      k += 1
    }
    sum
  }

  /** kaiser(M, β): I₀(β·√(1−((2n/(M−1))−1)²)) / I₀(β); kaiser(1) = [1.0]
    * (scipy's M=1 special case). Parameterized — the first win_type here
    * whose shape is tuned per call rather than fixed by M. */
  def kaiser(m: Int, beta: Double): Seq[Double] =
    if (m == 1) Seq(1.0)
    else {
      val den = besselI0(beta)
      (0 until m).map { n =>
        val t = 2.0 * n / (m - 1) - 1.0
        besselI0(beta * math.sqrt(math.max(0.0, 1.0 - t * t))) / den
      }
    }

  /** exponential(M, τ), symmetric center (M−1)/2: exp(−|n−center|/τ)
    * (scipy.signal.windows.exponential with default center, sym=True). */
  def exponential(m: Int, tau: Double): Seq[Double] = {
    require(tau > 0, s"tau must be positive: $tau")
    (0 until m).map(n => math.exp(-math.abs(n - (m - 1) / 2.0) / tau))
  }

  /** Weighted rolling mean over a full M-row frame: Σwᵢxᵢ/Σwᵢ via a
    * strict left-fold dot product (deterministic summation order — a
    * commutative sum would let partition order flip low bits), null
    * until the frame holds all M rows (pandas min_periods=window for
    * weighted windows). Scan-stage codegen; no shuffle beyond the
    * window's own partitioning. */
  def weightedMean(x: Column, w: WindowSpec, weights: Seq[Double],
      scale: Int = 6): Column = {
    val l = collect_list(x).over(w)
    val warr = array(weights.map(lit): _*)
    val num = aggregate(zip_with(l, warr, (a, b) => a * b),
      lit(0.0), (acc, v) => acc + v)
    when(size(l) === weights.size, round(num / lit(weights.sum), scale))
  }
}
