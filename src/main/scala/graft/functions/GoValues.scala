package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact Scala ports of the reference's value-classification parsers
  * (values_encoder.go), used by the write-time value_type classifier
  * (store/ValueTypeMeta) so part verdicts match the reference's
  * per-block `columnHeader.valueType` decisions:
  *
  *  - tryParseUint64 (:1258): decimal digits with `_` separators allowed
  *    anywhere, NO leading zero ("012" is a string), max 26 chars;
  *  - tryParseInt64 (:1303): optional minus + uint64 within int64 range
  *    (-(2^63) allowed);
  *  - tryParseFloat64Exact (:789): decimal only — no exponent, no
  *    leading/trailing dot; integer part per tryParseUint64; fractional
  *    part skips leading zeros then re-parses (issue 8464); integers
  *    >= 2^53 are rejected as inexact;
  *  - tryParseDateUint64 (:1233): digits only, leading zeros fine, <= 9
  *    chars — replicated VERBATIM including the two-digit fast path that
  *    never validates the second byte ("1x" parses);
  *  - tryParseIPv4 (:647): four tryParseDateUint64 octets <= 255;
  *  - tryParseTimestampISO8601 (:428): exactly `YYYY-MM-DDTHH:mm:ss.mmmZ`
  *    (or a space before HH), year in [1677, 2262], other components
  *    unvalidated (Go time.Date normalizes them).
  */
object GoValues {

  /** Column API for [[GoValueMetaExpr]]. */
  def metaCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    GraftFunctions.ensure()
    org.apache.spark.sql.functions.call_function("graft_value_meta", c)
  }

  private val U64Max = new java.math.BigInteger("18446744073709551615")

  /** Parsed uint64 as a non-negative BigInteger, or null. Accumulates in
    * a primitive long for the first 18 digits (10^18 < 2^63, always
    * exact) — the r14 soak measured per-digit BigInteger churn as a top
    * frame sorting folded numeric columns; only ≥19-digit inputs take
    * the BigInteger path. */
  def parseUint64(s: String): java.math.BigInteger = {
    val n = s.length
    if (n == 0 || n > 26) return null // len("18_446_744_073_709_551_615")
    if (n > 1 && s.charAt(0) == '0') return null
    var acc = 0L
    var i = 0
    var digits = 0
    while (i < n) {
      val ch = s.charAt(i)
      if (ch != '_') {
        if (ch < '0' || ch > '9') return null
        if (digits >= 18) return parseUint64Big(s)
        acc = acc * 10 + (ch - '0')
        digits += 1
      }
      i += 1
    }
    // Go's loop accepts all-underscore input as 0 (no digit requirement);
    // it never occurs in practice but fidelity is fidelity
    java.math.BigInteger.valueOf(acc)
  }

  /** The ≥19-digit tail of [[parseUint64]], with the U64Max bound. */
  private def parseUint64Big(s: String): java.math.BigInteger = {
    var acc = java.math.BigInteger.ZERO
    val TEN = java.math.BigInteger.TEN
    var i = 0
    val n = s.length
    while (i < n) {
      val ch = s.charAt(i)
      if (ch != '_') {
        if (ch < '0' || ch > '9') return null
        acc = acc.multiply(TEN).add(java.math.BigInteger.valueOf(ch - '0'))
        if (acc.compareTo(U64Max) > 0) return null
      }
      i += 1
    }
    acc
  }

  /** tryParseInt64: boxed value, null on failure. */
  def parseInt64(s: String): java.lang.Long = {
    if (s.isEmpty) return null
    val minus = s.charAt(0) == '-'
    val body = if (minus) s.substring(1) else s
    val n = parseUint64(body)
    if (n == null) return null
    val I63 = java.math.BigInteger.ONE.shiftLeft(63)
    if (n.compareTo(I63) > 0) return null
    if (n.compareTo(I63) == 0) {
      if (minus) return java.lang.Long.valueOf(Long.MinValue)
      return null
    }
    java.lang.Long.valueOf(if (minus) -n.longValue() else n.longValue())
  }

  def parseInt64Ok(s: String): Boolean = parseInt64(s) != null

  // Go math.Pow10 for n in [-31, 0]: 1e0 / pow10tab[-n] (a correctly-
  // rounded division, which is how the FMA fraction combine sees it)
  private def goPow10Neg(n: Int): Double = {
    val tab = Array(1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9,
      1e10, 1e11, 1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18, 1e19, 1e20,
      1e21, 1e22, 1e23, 1e24, 1e25, 1e26)
    1.0 / tab(-n)
  }

  /** tryParseFloat64Internal: boxed value, null on failure. Combines the
    * fraction with FMA exactly like the reference (values_encoder.go:843:
    * f = FMA(nFrac, Pow10(-len(sFrac)), nInt)); `exact` adds the 2^53
    * integer round-trip cap. */
  def parseFloat64Internal(s0: String, exact: Boolean): java.lang.Double = {
    val n0 = s0.length
    if (n0 == 0 || n0 > 27) return null // len("-18_446_744_073_709_551_615")
    val minus = s0.charAt(0) == '-'
    val s = if (minus) s0.substring(1) else s0
    val dot = s.indexOf('.')
    if (dot < 0) {
      val n = parseUint64(s)
      if (n == null) return null
      // integers >= 2^53 can't round-trip through float64
      if (exact &&
        n.compareTo(java.math.BigInteger.ONE.shiftLeft(53)) >= 0) return null
      val f = n.doubleValue()
      return java.lang.Double.valueOf(if (minus) -f else f)
    }
    if (dot == 0 || dot == s.length - 1) return null
    val nInt = parseUint64(s.substring(0, dot))
    if (nInt == null) return null
    val sFrac = s.substring(dot + 1)
    var k = 0
    while (k < sFrac.length - 1 && sFrac.charAt(k) == '0') k += 1
    val nFrac = parseUint64(sFrac.substring(k))
    if (nFrac == null) return null
    val p10 = goPow10Neg(sFrac.count(_ == '_') - sFrac.length)
    val f = Math.fma(nFrac.doubleValue(), p10, nInt.doubleValue())
    java.lang.Double.valueOf(if (minus) -f else f)
  }

  def parseFloat64Exact(s: String): java.lang.Double =
    parseFloat64Internal(s, exact = true)

  /** tryParseFloat64 — the lossy variant the duration/bytes parsers use. */
  def parseFloat64(s: String): java.lang.Double =
    parseFloat64Internal(s, exact = false)

  def parseFloat64ExactOk(s: String): Boolean = parseFloat64Exact(s) != null

  /** tryParseDateUint64, including the unchecked-second-byte two-digit
    * fast path (byte arithmetic wraps mod 256 like Go). */
  def parseDateUint64(s: String): Long = {
    val n = s.length
    if (n == 0 || n > 9) return -1L
    if (n == 2) {
      val c0 = s.charAt(0)
      if (c0 < '0' || c0 > '9') return -1L
      return 10L * (c0 - '0') + ((s.charAt(1) - '0').toByte & 0xFF)
    }
    var acc = 0L
    var i = 0
    while (i < n) {
      val ch = s.charAt(i)
      if (ch < '0' || ch > '9') return -1L
      acc = acc * 10 + (ch - '0')
      i += 1
    }
    acc
  }

  def parseIpv4Ok(s: String): Boolean = {
    val len = s.length
    if (len < 7 || len > 15) return false
    if (s.count(_ == '.') != 3) return false
    var rest = s
    var oct = 0
    while (oct < 3) {
      val n = rest.indexOf('.')
      if (n <= 0 || n > 3) return false
      val v = parseDateUint64(rest.substring(0, n))
      if (v < 0 || v > 255) return false
      rest = rest.substring(n + 1)
      oct += 1
    }
    val v = parseDateUint64(rest)
    v >= 0 && v <= 255
  }

  def parseIso8601Ok(s: String): Boolean = {
    if (s.length != 24) return false // "2006-01-02T15:04:05.000Z"
    if (s.charAt(4) != '-' || s.charAt(7) != '-') return false
    val delim = s.charAt(10)
    if (delim != 'T' && delim != ' ') return false
    if (s.charAt(13) != ':' || s.charAt(16) != ':') return false
    if (s.charAt(19) != '.' || s.charAt(23) != 'Z') return false
    val year = parseDateUint64(s.substring(0, 4))
    if (year < 1677 || year > 2262) return false
    // month/day/hour/minute/second/millis parse as date-uints; Go's
    // time.Date normalizes out-of-range components instead of rejecting
    val parts = Seq((5, 7), (8, 10), (11, 13), (14, 16), (17, 19), (20, 23))
      .map { case (a, b) => parseDateUint64(s.substring(a, b)) }
    if (parts.exists(_ < 0)) return false
    val Seq(month, day, hour, minute, second, _) = parts
    // epoch seconds with Go time.Date normalization (month 0/13, day 0/32
    // etc. roll over), then the int64-nanos range gate on SECONDS
    // (values_encoder.go: secs < -(1<<63)/1e9 || secs >= ((1<<63)-1)/1e9)
    val secs = java.time.LocalDate.of(year.toInt, 1, 1)
      .plusMonths(month - 1).plusDays(day - 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond +
      hour * 3600L + minute * 60L + second
    !(secs < -9223372036L || secs >= 9223372036L)
  }
}

/** Per-value classification struct for the write-time value_type
  * classifier: which encoder parse families accept the value, plus the
  * uint value for the uint8/16/32/64 width decision. Runs once per part
  * at ingest/compaction (not a query hot path). */
case class GoValueMetaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_value_meta needs a string input, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("u", BooleanType, nullable = false),
    StructField("uval", DecimalType(20, 0), nullable = true),
    StructField("i", BooleanType, nullable = false),
    StructField("f", BooleanType, nullable = false),
    StructField("ip", BooleanType, nullable = false),
    StructField("iso", BooleanType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val u = GoValues.parseUint64(s)
    val row = new GenericInternalRow(6)
    row.setBoolean(0, u != null)
    if (u == null) row.setNullAt(1)
    else row.update(1, org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(u), 20, 0))
    row.setBoolean(2, GoValues.parseInt64Ok(s))
    row.setBoolean(3, GoValues.parseFloat64ExactOk(s))
    row.setBoolean(4, GoValues.parseIpv4Ok(s))
    row.setBoolean(5, GoValues.parseIso8601Ok(s))
    row
  }

  override protected def withNewChildInternal(newChild: Expression): GoValueMetaExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_value_meta"
}
