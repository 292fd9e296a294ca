package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Go `strconv.AppendFloat(dst, f, 'f', -1, 64)` — the reference's single
  * float renderer (marshalFloat64String, values_encoder.go:1404-1406, and
  * every stats_*.go result marshal): FIXED notation always (never
  * E-notation — 1e21 is "1000000000000000000000", 1e-7 is "0.0000001"),
  * with the minimum digit count that round-trips, "+Inf"/"-Inf"/"NaN",
  * and "-0" for negative zero.
  *
  * Java/Spark's double→string cast switches to E-notation outside
  * [1e-3, 1e7) and always keeps a ".0" on integral values, so a plain
  * cast diverges from the reference on every such value.
  *
  * Shortest-digits search: correctly-rounded p-significant-digit decimal
  * (`%.pE`, exact HALF_UP conversion) for p = 0,1,2,… until the decimal
  * parses back to the exact input — the same uniqueness rule strconv
  * documents for precision -1. If any p-digit decimal round-trips, the
  * correctly-rounded one does too (it is at least as close to the value,
  * so it lies inside the same rounding interval), so the search finds the
  * minimal length; 17 digits always round-trip and bound the loop.
  */
object GoFloat {

  /** Column API (lazy temp-function registration like the other
    * kernels). */
  def render(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    GraftFunctions.ensure()
    org.apache.spark.sql.functions.call_function("graft_go_float", c)
  }

  def format(d: Double): String = {
    if (d != d) return "NaN"
    if (d == Double.PositiveInfinity) return "+Inf"
    if (d == Double.NegativeInfinity) return "-Inf"
    if (d == 0.0) return if (1.0 / d < 0) "-0" else "0"
    val neg = d < 0
    val a = if (neg) -d else d
    // integral doubles below 1e15: the integer IS the shortest repr
    // (every added fractional digit is a longer string), and Long
    // rendering skips the format/parse loop for the common count case
    if (a < 1e15 && a == Math.floor(a))
      return (if (neg) "-" else "") + java.lang.Long.toString(a.toLong)
    // short-decimal fast path: almost every rendered log value is a
    // ≤8-decimal-place number (prices, ratios, durations). If
    // round(a·10^k)/10^k == a then "L with k decimal places" parses back
    // to a EXACTLY (L and 10^k are exact doubles and IEEE division is
    // correctly rounded, which is also what parseDouble computes), and
    // ascending k yields the minimal digit string — ~30ns vs ~1-3µs for
    // the BigDecimal search below (which remains for long-tail values)
    var k = 1
    var p10 = 10.0
    while (k <= 8) {
      val scaled = a * p10
      if (scaled < 9.007199254740992e15) { // long-exact range
        val l = Math.round(scaled)
        if (l.toDouble / p10 == a) return emitDecimal(neg, l, k)
      }
      k += 1
      p10 *= 10.0
    }
    // correctly-rounded p-significant-digit decimals via BigDecimal:
    // BigDecimal(double) is the EXACT binary expansion, and
    // round(MathContext(p, HALF_UP)) is the same correctly-rounded
    // decimal `%.{p-1}E` produced — but without java.util.Formatter,
    // which allocates a Formatter + DecimalFormatSymbols per call
    // (~15µs/value; all 32 soak cores measured parked in
    // DecimalFormatSymbols.getInstance rendering a folded 200M-row
    // column, r14)
    val exact = new java.math.BigDecimal(a)
    var p = 1
    while (p < 17) {
      val r = exact.round(new java.math.MathContext(p,
        java.math.RoundingMode.HALF_UP))
      if (r.doubleValue() == a) return emit(neg, r)
      p += 1
    }
    emit(neg, exact.round(new java.math.MathContext(17,
      java.math.RoundingMode.HALF_UP)))
  }

  /** Same rule against float32 round-trip (Go renders a float32 via
    * FormatFloat(float64(f), 'f', -1, 32) — shortest digits that parse
    * back to the float): keeps "14.3" instead of the widened double's
    * "14.300000190734863". */
  def formatFloat(f: Float): String = {
    if (f != f) return "NaN"
    if (f == Float.PositiveInfinity) return "+Inf"
    if (f == Float.NegativeInfinity) return "-Inf"
    if (f == 0.0f) return if (1.0f / f < 0) "-0" else "0"
    val neg = f < 0
    val a = if (neg) -f else f
    if (a < 1e7f && a == Math.floor(a))
      return (if (neg) "-" else "") + java.lang.Integer.toString(a.toInt)
    val exact = new java.math.BigDecimal(a.toDouble)
    var p = 1
    while (p < 9) {
      val r = exact.round(new java.math.MathContext(p,
        java.math.RoundingMode.HALF_UP))
      if (r.floatValue() == a) return emit(neg, r)
      p += 1
    }
    emit(neg, exact.round(new java.math.MathContext(9,
      java.math.RoundingMode.HALF_UP)))
  }

  /** `l` with `k` decimal places → fixed notation ("123.45"). `l` never
    * ends in 0 here (a trailing zero means k-1 places also round-trip,
    * so the ascending-k search matched earlier). */
  private def emitDecimal(neg: Boolean, l: Long, k: Int): String = {
    val digits = java.lang.Long.toString(l)
    val n = digits.length
    val sb = new java.lang.StringBuilder(n + k + 3)
    if (neg) sb.append('-')
    if (n > k) sb.append(digits, 0, n - k).append('.').append(digits, n - k, n)
    else {
      sb.append("0.")
      var i = 0
      while (i < k - n) { sb.append('0'); i += 1 }
      sb.append(digits)
    }
    sb.toString
  }

  /** Rounded decimal → fixed notation ("14.3"), minimal digits. */
  private def emit(neg: Boolean, r0: java.math.BigDecimal): String = {
    // the max-precision fallback can carry value-preserving trailing
    // zeros ("0.70" parses equal to "0.7"); a terminating search value
    // never does (its stripped form would have terminated earlier) —
    // stripping is correct for both
    val r = r0.stripTrailingZeros()
    val digits = r.unscaledValue().toString
    // decimal exponent of the leading digit, as in "d.dddE<exp>"
    val exp = r.precision() - r.scale() - 1
    val n = digits.length
    val sb = new java.lang.StringBuilder(n + math.abs(exp) + 3)
    if (neg) sb.append('-')
    if (exp >= n - 1) {
      sb.append(digits)
      var i = 0
      while (i < exp - (n - 1)) { sb.append('0'); i += 1 }
    } else if (exp >= 0) {
      sb.append(digits, 0, exp + 1).append('.').append(digits, exp + 1, n)
    } else {
      sb.append("0.")
      var i = 0
      while (i < -exp - 1) { sb.append('0'); i += 1 }
      sb.append(digits)
    }
    sb.toString
  }
}

/** double|float → Go-rendered string column ([[GoFloat]]). */
case class GoFloatStrExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_go_float needs a double or float input, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  private def isFloat = child.dataType == FloatType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      if (isFloat) GoFloat.formatFloat(input.asInstanceOf[Float])
      else GoFloat.format(input.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val call =
        if (isFloat) s"graft.functions.GoFloat.formatFloat($v)"
        else s"graft.functions.GoFloat.format($v)"
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($call);"
    })

  override protected def withNewChildInternal(newChild: Expression): GoFloatStrExpr =
    copy(child = newChild)
}
