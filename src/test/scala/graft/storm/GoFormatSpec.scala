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
    100000.0 -> "100000", // exp 5: still fixed form
    999999.0 -> "999999",
    1e6 -> "1e+06", // exp >= 6 switches to exponential (Go fmt.Println(1e6))
    1234567.0 -> "1.234567e+06",
    2724168.0 -> "2.724168e+06", // Prometheus-style Go output
    1e21 -> "1e+21",
    1.5e22 -> "1.5e+22",
    9.999e20 -> "9.999e+20",
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

  test("e-notation boundary sits at exponent 6 exactly, like Go fmt") {
    assert(GoFormat.formatG(999999.9) == "999999.9") // exp 5
    assert(GoFormat.formatG(1000000.5) == "1.0000005e+06")
    assert(GoFormat.formatG(-2e6) == "-2e+06")
    assert(GoFormat.formatG(0.0001) == "0.0001") // exp -4 stays fixed
    assert(GoFormat.formatG(0.00009) == "9e-05") // exp -5 switches
  }
}

class GoShortestSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("formatG emits shortest digits even where JDK 17 Double.toString does not") {
    // JDK 17 (pre-Ryu) renders this as 4.0301848979298272E17 (17 digits);
    // the shortest round-trip is 4.030184897929827e17 (16) — Go prints the
    // exponential form (exp 17 >= 6) of the shortest digits
    assert(GoFormat.formatG(4.0301848979298272e17) == "4.030184897929827e+17")
    // and a sweep: our digits never exceed the shortest length that
    // round-trips (cross-checked via parse-back)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20000) {
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!d.isNaN && !d.isInfinite && d != 0.0) {
        val g = GoFormat.formatG(d)
        val parsed = java.lang.Double.parseDouble(
          g.replace("e", "E")) // Go exponent style -> Java parser
        assert(parsed == d, s"round-trip broke for $d -> $g")
      }
    }
  }
}

class GoFormatFSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("formatF rounds the binary value, not the shortest repr") {
    // true binary of 19.64995 is ...95000000000047 → rounds UP
    assert(GoFormat.formatF(19.64995, 4) == "19.6500")
    // true binary of 81.35 is 81.34999... → rounds DOWN (Java %.2f→%.1f
    // style shortest-repr rounding would give 81.4)
    assert(GoFormat.formatF(81.35, 1) == "81.3")
    assert(GoFormat.formatF(0.35, 1) == "0.3")
    // exact ties (binary-representable midpoints) go to even, like Go/C
    assert(GoFormat.formatF(0.25, 1) == "0.2")
    assert(GoFormat.formatF(0.75, 1) == "0.8")
  }

  test("formatF basics: padding, sign, specials") {
    assert(GoFormat.formatF(31.02, 4) == "31.0200")
    assert(GoFormat.formatF(-98.44, 4) == "-98.4400")
    assert(GoFormat.formatF(0.0, 4) == "0.0000")
    assert(GoFormat.formatF(-0.0, 4) == "-0.0000") // Go keeps the sign
    assert(GoFormat.formatF(-0.00001, 4) == "-0.0000") // negative → signed zero
    assert(GoFormat.formatF(0.00001, 4) == "0.0000")
    assert(GoFormat.formatF(Double.NaN, 4) == "NaN")
    assert(GoFormat.formatF(Double.PositiveInfinity, 4) == "+Inf")
  }
}
