package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity (Jaro 1989; Winkler 1990) as a native codegen
  * expression — the record-linkage scorer that rewards shared prefixes,
  * the standard second lens next to edit distance in entity resolution
  * (see [[graft.operators.FuzzyJoin]] for the blocked-join shape it
  * plugs into).
  *
  * Spark ships `levenshtein` but no Jaro-Winkler; a Scala UDF would fall
  * out of whole-stage codegen and pay serialization per row. This is the
  * tier-(b) build-guideline upgrade: `doGenCode` emits one static call
  * (the body JIT-compiles like any hot JVM method), inputs stay
  * `UTF8String`, no boxing.
  *
  * Semantics — the textbook algorithm, matching DuckDB's
  * `jaro_winkler_similarity` (rapidfuzz semantics) so the oracle can
  * bind values, not just pairs:
  *  - match window `max(⌊max(|a|,|b|)/2⌋ − 1, 0)`, greedy left-to-right
  *    matching, transpositions = half the out-of-order matched pairs;
  *  - `jaro = (m/|a| + m/|b| + (m−t)/m) / 3` in double, in that order;
  *  - Winkler boost ONLY when `jaro > 0.7`: `jaro + ℓ·0.1·(1−jaro)`
  *    with ℓ = common prefix capped at 4 (probed against DuckDB:
  *    boost gated at 0.7, cap 4, scale 0.1);
  *  - either side empty or zero matches → 0.0.
  * Verified value-exact (raw doubles, no rounding) against DuckDB over
  * every blocked candidate pair at all three SFs (JaroWinklerSpec pins
  * the published worked examples + properties). */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerSim.similarity(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerSim.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {

  /** Static kernel the generated code calls. */
  def similarity(a: UTF8String, b: UTF8String): Double =
    jw(a.toString, b.toString)

  def jw(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](l1)
    val matched2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var k = 0
    var mismatch = 0
    i = 0
    while (i < l1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val t = mismatch / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val cap = math.min(math.min(l1, l2), 4)
    while (prefix < cap && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
