package graft.storm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shortest-round-trip float formatting compatible with Go's
  * `strconv.FormatFloat(f, 'g', -1, 64)` — i.e. `fmt.Sprintf("%g", f)`.
  *
  * The reference embeds `%g`-formatted magnitudes inside its deterministic
  * SHA-256 event IDs (`internal/domain/transform.go:134-142`), so byte-exact
  * ID parity requires reproducing this exact rendering. Differences from
  * Java's `Double.toString`: integers print without `.0` ("2", not "2.0"),
  * and scientific notation kicks in when the decimal exponent is < -4 or
  * >= 6 (strconv's shortest-'g' eprec, same cutoff as C's %g — NOT the
  * >= 21 rule, which is ES6/encoding-json, not fmt), with Go's `e+XX`
  * exponent style: Go prints 1e6 as "1e+06" and 9.999e20 as "9.999e+20".
  */
object GoFormat {

  def formatG(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "NaN"
    if (d == java.lang.Double.POSITIVE_INFINITY) return "+Inf"
    if (d == java.lang.Double.NEGATIVE_INFINITY) return "-Inf"
    if (d == 0.0d) {
      // Go prints "-0" for negative zero.
      return if ((java.lang.Double.doubleToRawLongBits(d) >>> 63) == 1L) "-0" else "0"
    }
    val neg = d < 0
    val abs = math.abs(d)
    // Shortest round-tripping digit string, computed directly: the smallest
    // significant-digit count whose correctly-rounded decimal parses back to
    // the same double — Go's 'g -1' contract. (JDK 17's Double.toString is
    // NOT always shortest — ~0.3% of doubles get extra digits pre-Ryu — so
    // it cannot be used here.)
    val (digits, exp) = shortestDigits(abs)
    val dp = exp + 1 // decimal point position from the left of the digits
    val body =
      if (exp < -4 || exp >= 6) {
        // Go exponential form: d[.ddd]e±XX with >=2 exponent digits
        val m =
          if (digits.length == 1) digits
          else digits.substring(0, 1) + "." + digits.substring(1)
        val sign = if (exp < 0) "-" else "+"
        val ea = math.abs(exp)
        val es = if (ea < 10) "0" + ea else ea.toString
        m + "e" + sign + es
      } else if (dp <= 0) {
        "0." + ("0" * (-dp)) + digits
      } else if (dp >= digits.length) {
        digits + ("0" * (dp - digits.length))
      } else {
        digits.substring(0, dp) + "." + digits.substring(dp)
      }
    if (neg) "-" + body else body
  }

  /** (digit string without leading/trailing zeros, decimal exponent) of the
    * shortest correctly-rounded decimal that round-trips to `abs`. */
  private def shortestDigits(abs: Double): (String, Int) = {
    val exact = new java.math.BigDecimal(abs)
    var p = 1
    var candidate: java.math.BigDecimal = null
    var found = false
    while (!found && p <= 17) {
      candidate = exact.round(new java.math.MathContext(p,
        java.math.RoundingMode.HALF_EVEN))
      if (candidate.doubleValue() == abs) found = true else p += 1
    }
    val stripped = candidate.stripTrailingZeros
    val digits = stripped.unscaledValue.abs.toString
    // value = digits * 10^(-scale); exponent of the leading digit:
    val exp = digits.length - 1 - stripped.scale
    (digits, exp)
  }

  /** Go-`fmt.Sprintf("%.<prec>f", d)` — fixed precision, correctly rounded
    * from the BINARY value (ties to even), like Go's strconv and C printf.
    * Java's `String.format("%.1f")` instead rounds the SHORTEST decimal
    * repr HALF_UP, which diverges whenever the binary value sits on the
    * other side of the half from the shortest repr's literal digits
    * (e.g. 81.35 → binary 81.3499…: Go/C print "81.3", Java "81.4").
    * BigDecimal(d) is the exact binary expansion, so HALF_EVEN on it
    * reproduces Go (and DuckDB's printf) for every double.
    */
  def formatF(d: Double, prec: Int): String = {
    if (java.lang.Double.isNaN(d)) return "NaN"
    if (d == java.lang.Double.POSITIVE_INFINITY) return "+Inf"
    if (d == java.lang.Double.NEGATIVE_INFINITY) return "-Inf"
    val bd = new java.math.BigDecimal(d)
      .setScale(prec, java.math.RoundingMode.HALF_EVEN)
    val body = bd.toPlainString
    // Go/C print the sign whenever the VALUE is negative (or negative
    // zero), even when it rounds to zero at this precision: %.4f of
    // -0.00001 → "-0.0000". BigDecimal normalizes that sign away.
    val signBit = (java.lang.Double.doubleToRawLongBits(d) >>> 63) == 1L
    if (signBit && bd.signum() == 0) "-" + body else body
  }

  /** Column wrapper for [[GoFmtG]]. Input is cast to double so the
    * expression only ever sees doubles. */
  def go_fmt_g(c: Column): Column =
    ColumnBridge.column(GoFmtG(ColumnBridge.expression(c.cast("double"))))

  /** Column wrapper for [[GoFmtF]]. */
  def go_fmt_f(c: Column, prec: Int): Column =
    ColumnBridge.column(GoFmtF(ColumnBridge.expression(c.cast("double")), prec))
}

/** Catalyst expression for Go-`%g` float formatting. Null-safe; interpreted
  * eval plus codegen that calls the static formatter (keeps the surrounding
  * projection inside whole-stage codegen — the call itself is a cheap static
  * method on a tiny string). */
case class GoFmtG(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def prettyName: String = "go_fmt_g"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(GoFormat.formatG(input.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.storm.GoFormat.formatG($c))")

  override protected def withNewChildInternal(newChild: Expression): GoFmtG =
    copy(child = newChild)
}

/** Catalyst expression for Go-`%.<prec>f` fixed formatting (see
  * [[GoFormat.formatF]]); codegen-friendly like [[GoFmtG]]. */
case class GoFmtF(child: Expression, prec: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def prettyName: String = "go_fmt_f"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(GoFormat.formatF(input.asInstanceOf[Double], prec))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.storm.GoFormat.formatF($c, $prec))")

  override protected def withNewChildInternal(newChild: Expression): GoFmtF =
    copy(child = newChild)
}
