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
}
