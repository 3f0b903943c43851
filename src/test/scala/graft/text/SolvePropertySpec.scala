package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Property check for the normal-equation solver: for seeded random
  * well-conditioned SPD systems A = L·L' + I (L lower-triangular with
  * bounded entries) and random planted w, solving A·w' = A·w recovers w
  * to near machine precision at k = 6 — the classifier's exact shape. */
class SolvePropertySpec extends AnyFunSuite {

  private val k = 6

  test("solve recovers the planted solution on 200 random SPD systems") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 200) {
      val l = Array.tabulate(k, k)((i, j) =>
        if (j <= i) rnd.nextDouble() * 6.0 - 3.0 else 0.0)
      // A = L·L' + I: symmetric positive-definite, condition bounded
      val a = Array.tabulate(k, k) { (i, j) =>
        var s = if (i == j) 1.0 else 0.0
        var m = 0
        while (m < k) { s += l(i)(m) * l(j)(m); m += 1 }
        s
      }
      val w = Array.fill(k)(rnd.nextDouble() * 20.0 - 10.0)
      val b = Array.tabulate(k) { i =>
        var s = 0.0
        var j = 0
        while (j < k) { s += a(i)(j) * w(j); j += 1 }
        s
      }
      val got = QualityClassifier.solve(a, b)
      val err = (0 until k).map(i => math.abs(got(i) - w(i))).max
      assert(err < 1e-8, s"trial $trial: max err $err for ${w.toSeq}")
    }
  }
}
