package graft

import graft.operators.WindowWeights
import org.scalatest.funsuite.AnyFunSuite

/** Pins the win_type weight generators to scipy.signal reference values
  * (reference: pandas/core/window.py:434 delegates to
  * scipy.signal.get_window(..., fftbins=False)). */
class WindowWeightsSpec extends AnyFunSuite {

  private def approx(a: Seq[Double], b: Seq[Double]): Unit = {
    assert(a.size == b.size, s"sizes: ${a.size} vs ${b.size}")
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-12, s"$x != $y in $a vs $b")
    }
  }

  test("boxcar is all ones") {
    approx(WindowWeights.boxcar(4), Seq(1.0, 1.0, 1.0, 1.0))
  }

  test("triang matches scipy for odd and even M") {
    // scipy.signal.windows.triang(5) / triang(4)
    approx(WindowWeights.triang(5), Seq(1.0 / 3, 2.0 / 3, 1.0, 2.0 / 3, 1.0 / 3))
    approx(WindowWeights.triang(4), Seq(0.25, 0.75, 0.75, 0.25))
  }

  test("bartlett has zero endpoints and unit peak") {
    approx(WindowWeights.bartlett(5), Seq(0.0, 0.5, 1.0, 0.5, 0.0))
  }

  // Note: hamming/blackman are symmetric only to 1 ULP (cos at mirrored
  // arguments rounds differently) — exactly like numpy's own output; the
  // oracle parity is unaffected because both engines get the SAME
  // literal vector.
  test("hamming matches the 0.54/0.46 cosine series") {
    val w = WindowWeights.hamming(5)
    approx(Seq(w.head, w(2), w.last), Seq(0.08, 1.0, 0.08))
    approx(w, w.reverse)
  }

  test("blackman endpoints ~0, peak 1, symmetric") {
    val w = WindowWeights.blackman(7)
    assert(math.abs(w.head) < 1e-15 && math.abs(w.last) < 1e-15)
    assert(math.abs(w(3) - 1.0) < 1e-12)
    approx(w, w.reverse)
  }

  test("gaussian matches exp(-half x squared) at the tails") {
    val w = WindowWeights.gaussian(7, 2.0)
    approx(Seq(w(3)), Seq(1.0))
    approx(Seq(w.head), Seq(math.exp(-0.5 * math.pow(3 / 2.0, 2))))
    assert(w == w.reverse)
  }

  test("m=1 special cases collapse to [1.0]") {
    for (w <- Seq(WindowWeights.bartlett(1), WindowWeights.hamming(1),
      WindowWeights.blackman(1), WindowWeights.kaiser(1, 8.6)))
      assert(w == Seq(1.0))
  }

  test("kaiser(7, 8.6) matches numpy.kaiser") {
    // numpy.kaiser(7, 8.6) and numpy.i0(8.6), captured verbatim
    assert(math.abs(WindowWeights.besselI0(8.6) - 750.4611595631659) < 1e-9)
    val want = Seq(0.0013325139979024198, 0.13040194654166437,
      0.6304119273359405, 1.0, 0.6304119273359405, 0.13040194654166437,
      0.0013325139979024198)
    WindowWeights.kaiser(7, 8.6).zip(want).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-12 * math.max(1.0, b), s"$a vs $b")
    }
  }

  test("exponential(7, 2.0) matches scipy's symmetric form") {
    val want = Seq(0.22313016014842982, 0.3678794411714424,
      0.6065306597126334, 1.0, 0.6065306597126334, 0.3678794411714424,
      0.22313016014842982)
    approx(WindowWeights.exponential(7, 2.0), want)
    assert(WindowWeights.exponential(7, 2.0) ==
      WindowWeights.exponential(7, 2.0).reverse)
  }
}
