package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite

/** Published worked examples, the Winkler-boost gating laws, and
  * codegen ≡ interpreted ≡ driver-kernel agreement for the native
  * Jaro-Winkler expression. */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("published worked examples (values probed identical in DuckDB)") {
    // (a, b, expected jaro_winkler) — textbook pairs
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("dwayne", "duane", 0.8400000000000001),
      ("crate", "trace", 0.7333333333333334),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("abc", "", 0.0),
      ("a", "b", 0.0),
      ("ab", "ba", 0.0), // window 0: adjacent swap has no matches
      ("abcdexyzw", "abcdeqrst", 0.8222222222222222)) // prefix capped at 4
    for ((a, b, want) <- cases) {
      assert(JaroWinklerSim.jw(a, b) == want, s"($a, $b)")
      assert(JaroWinklerSim.jw(b, a) == want, s"symmetric ($b, $a)")
    }
  }

  test("winkler boost gated at jaro > 0.7") {
    // common prefix but jaro ≤ 0.7 → no boost
    assert(JaroWinklerSim.jw("abqqqqqq", "abzzzzzz") == 0.5)
    assert(JaroWinklerSim.jw("aaaaaa", "aaazzz") == 0.6666666666666666)
    // jaro just above 0.7 with prefix → boosted
    assert(JaroWinklerSim.jw("ab", "abzzzzzzzz") == 0.7866666666666667)
  }

  private def jw(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ColumnBridge.column(
      JaroWinklerSim(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  test("expression (codegen path) equals the driver kernel") {
    import spark.implicits._
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("same", "same"), ("x", ""), ("prefixed", "prefixxy"))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), jw(col("a"), col("b")).as("jw"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    for ((a, b, v) <- got)
      assert(v == JaroWinklerSim.jw(a, b), s"($a, $b)")
  }

  test("range and identity laws on real part names") {
    val rows = graft.Tables(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_name"),
        jw(col("p_name"), col("p_name")).as("self"),
        jw(col("p_name"), expr("reverse(p_name)")).as("rev"))
      .collect()
    for (r <- rows) {
      assert(r.getDouble(1) == 1.0)
      val rev = r.getDouble(2)
      assert(rev >= 0.0 && rev <= 1.0)
    }
  }
}
