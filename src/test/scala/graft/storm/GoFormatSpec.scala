package graft.storm

import org.scalatest.funsuite.AnyFunSuite

class GoFormatSpec extends AnyFunSuite {

  // Expected values = Go fmt.Sprintf("%g", x) output.
  val table: Seq[(Double, String)] = Seq(
    0.0 -> "0",
    1.0 -> "1",
    2.0 -> "2",
    125.0 -> "125",
    1.25 -> "1.25",
    0.75 -> "0.75",
    1.75 -> "1.75",
    -3.5 -> "-3.5",
    0.0001 -> "0.0001",
    0.00001 -> "1e-05",
    65.0 -> "65",
    100000.0 -> "100000",
    1e21 -> "1e+21",
    1.5e22 -> "1.5e+22",
    9.999e20 -> "999900000000000000000",
    0.1 -> "0.1",
    1.0 / 3.0 -> "0.3333333333333333",
    8.0 -> "8",
    123.456 -> "123.456")

  test("formatG matches Go %g on known values") {
    table.foreach { case (in, want) =>
      assert(GoFormat.formatG(in) == want, s"input $in")
    }
  }

  test("negative zero formats as -0") {
    assert(GoFormat.formatG(-0.0) == "-0")
  }

  test("formatG round-trips: parse(format(x)) == x") {
    val rnd = new scala.util.Random(42)
    (1 to 20000).foreach { _ =>
      val x = (rnd.nextDouble() - 0.5) * 2e6
      assert(java.lang.Double.parseDouble(GoFormat.formatG(x)) == x, s"input $x")
    }
    // and across magnitudes, including the e-notation boundaries
    (-30 to 30).foreach { e =>
      val x = 1.2345678901234567 * math.pow(10, e)
      assert(java.lang.Double.parseDouble(GoFormat.formatG(x)) == x, s"input $x")
    }
  }

  test("integral doubles never carry a trailing .0") {
    (-1000 to 1000).foreach { n =>
      assert(GoFormat.formatG(n.toDouble) == n.toString)
    }
  }
}
