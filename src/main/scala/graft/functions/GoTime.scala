package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact ports of the reference's ingest-side timestamp handling:
  *
  *  - TryParseTimestampRFC3339Nano (values_encoder.go:428): flexible
  *    RFC3339 with 'T' or ' ' date/time delimiter, optional fractional
  *    seconds up to 9 digits (a missing leading dot is tolerated), and a
  *    'Z' / ±hh:mm timezone — a MISSING timezone falls back to the local
  *    offset; year 1677-2262 with the int64-nanos seconds gate;
  *  - timeutil.TryParseUnixTimestamp (lib/timeutil/time.go:158): integer,
  *    fractional, or scientific unix timestamps whose unit (s/ms/µs/ns)
  *    is inferred from magnitude (±2^31 second thresholds);
  *  - insertutil.parseTimestamp (app/vlinsert/insertutil/timestamp.go:39):
  *    ""/"0"/"-" mean "ingestion time"; values shorter than "YYYY-" or
  *    without the year dash parse as unix timestamps, everything else as
  *    RFC3339;
  *  - marshalTimestampRFC3339NanoString: RFC3339 UTC with the fractional
  *    second's trailing zeros (and an empty fraction's dot) trimmed.
  */
object GoTime {

  /** Column API for [[GoTimestampParse]]. */
  def parseCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    GraftFunctions.ensure()
    org.apache.spark.sql.functions.call_function("graft_time_parse", c)
  }

  private val NsPerSec = 1000000000L

  /** tryParseTimestampSecs (values_encoder.go): fixed "YYYY-MM-DD[T ]
    * HH:MM:SS" prefix with Go time.Date component normalization and the
    * int64-nanos seconds gate. Returns epoch seconds, or null. */
  private def parseTimestampSecs(s: String): java.lang.Long = {
    if (s.length < 19) return null
    if (s.charAt(4) != '-' || s.charAt(7) != '-') return null
    val delim = s.charAt(10)
    if (delim != 'T' && delim != ' ') return null
    if (s.charAt(13) != ':' || s.charAt(16) != ':') return null
    val year = GoValues.parseDateUint64(s.substring(0, 4))
    if (year < 1677 || year > 2262) return null
    val month = GoValues.parseDateUint64(s.substring(5, 7))
    val day = GoValues.parseDateUint64(s.substring(8, 10))
    val hour = GoValues.parseDateUint64(s.substring(11, 13))
    val minute = GoValues.parseDateUint64(s.substring(14, 16))
    val second = GoValues.parseDateUint64(s.substring(17, 19))
    if (month < 0 || day < 0 || hour < 0 || minute < 0 || second < 0)
      return null
    val secs = java.time.LocalDate.of(year.toInt, 1, 1)
      .plusMonths(month - 1).plusDays(day - 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond +
      hour * 3600L + minute * 60L + second
    if (secs < -9223372036L || secs >= 9223372036L) null
    else java.lang.Long.valueOf(secs)
  }

  /** tryParseHHMM (values_encoder.go:408): hours <= 24, minutes <= 60
    * (the reference's own lenient bounds), two-digit fast-path quirks
    * included via parseDateUint64. Returns nanos or -1. */
  private def parseHHMM(s: String): Long = {
    if (s.length != 5 || s.charAt(2) != ':') return -1L
    val h = GoValues.parseDateUint64(s.substring(0, 2))
    val m = GoValues.parseDateUint64(s.substring(3))
    if (h < 0 || h > 24 || m < 0 || m > 60) return -1L
    h * 3600L * NsPerSec + m * 60L * NsPerSec
  }

  /** Local timezone offset in nanos (GetLocalTimezoneOffsetNsecs) — the
    * fallback for RFC3339 values without an explicit timezone. */
  private def localOffsetNs: Long =
    java.util.TimeZone.getDefault
      .getOffset(System.currentTimeMillis()).toLong * 1000000L

  /** TryParseTimestampRFC3339Nano: nanos since epoch, or null. */
  def parseRfc3339Nanos(s0: String): java.lang.Long = {
    if (s0.length < 19) return null
    val secs = parseTimestampSecs(s0)
    if (secs == null) return null
    var nsecs = secs.longValue() * NsPerSec
    var s = s0.substring(19)
    // timezone suffix: Z, ±hh:mm, or none (local offset)
    if (s.endsWith("Z")) s = s.dropRight(1)
    else {
      val n = math.max(s.lastIndexOf('+'), s.lastIndexOf('-'))
      if (n < 0) nsecs -= localOffsetNs
      else {
        val off = parseHHMM(s.substring(n + 1))
        if (off < 0) return null
        nsecs -= (if (s.charAt(n) == '-') -off else off)
        s = s.substring(0, n)
      }
    }
    if (s.isEmpty) return java.lang.Long.valueOf(nsecs)
    // optional fractional seconds (a missing leading dot is tolerated,
    // values_encoder.go:448-451)
    if (s.charAt(0) == '.') s = s.substring(1)
    val digits = s.length
    if (digits > 9) return null
    val frac = GoValues.parseDateUint64(s)
    if (frac < 0) return null
    val p10 = Array(1L, 10L, 100L, 1000L, 10000L, 100000L, 1000000L,
      10000000L, 100000000L)
    java.lang.Long.valueOf(nsecs + frac * p10(9 - digits))
  }

  /** getUnixTimestampNanoseconds: unit from magnitude. */
  private def unitNanos(n: Long): Long = {
    val G = 1L << 31
    if (n < G && n >= -G) n * NsPerSec
    else if (n < 1000L * G && n >= -1000L * G) n * 1000000L
    else if (n < 1000000L * G && n >= -1000000L * G) n * 1000L
    else n
  }

  /** timeutil.TryParseUnixTimestamp: nanos, or null. */
  def parseUnixNanos(s: String): java.lang.Long = {
    val expIdx = s.indexWhere(c => c == 'e' || c == 'E')
    try {
      if (expIdx >= 0) {
        // scientific: mantissa scaled by 10^exp, exact or bust
        val exp = s.substring(expIdx + 1).toLong
        val n = new java.math.BigDecimal(s.substring(0, expIdx))
          .scaleByPowerOfTen(exp.toInt).longValueExact()
        return java.lang.Long.valueOf(unitNanos(adjustTo3(
          n, 0)))
      }
      val dot = s.indexOf('.')
      if (dot < 0)
        return java.lang.Long.valueOf(unitNanos(s.toLong))
      // fractional: int digits ++ frac digits, then pad to a multiple of
      // three decimals (time.go:193-201)
      val intPart = s.substring(0, dot)
      val fracPart = s.substring(dot + 1)
      if (fracPart.isEmpty || !fracPart.forall(_.isDigit)) return null
      val neg = intPart.startsWith("-")
      val base = (if (neg) intPart.drop(1) else intPart.stripPrefix("+"))
      val combined = java.lang.Long.parseLong(base + fracPart)
      val n0 = if (neg) -combined else combined
      java.lang.Long.valueOf(unitNanos(adjustTo3(n0, fracPart.length)))
    } catch {
      case _: NumberFormatException | _: ArithmeticException => null
    }
  }

  private def adjustTo3(n0: Long, decimals0: Int): Long = {
    var n = n0
    var d = decimals0
    while (d % 3 != 0) { n = Math.multiplyExact(n, 10L); d += 1 }
    n
  }

  /** insertutil.parseTimestamp: null = parse ERROR; Long.MinValue
    * sentinel = "use the ingestion time" (""/"0"/"-", like the
    * reference substitutes time.Now()). */
  def parseIngestNanos(s: String): java.lang.Long = {
    if (s == null || s.isEmpty || s == "0" || s == "-")
      return java.lang.Long.valueOf(Long.MinValue)
    if (s.length <= 4 || s.charAt(4) != '-') parseUnixNanos(s)
    else parseRfc3339Nanos(s)
  }

  /** marshalTimestampRFC3339NanoString: UTC RFC3339, fraction's trailing
    * zeros trimmed, no dot for a whole second. */
  def formatRfc3339Nanos(ns: Long): String = {
    val secs = Math.floorDiv(ns, NsPerSec)
    val frac = Math.floorMod(ns, NsPerSec)
    val base = java.time.LocalDateTime.ofEpochSecond(
      secs, 0, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern(
        "yyyy-MM-dd'T'HH:mm:ss"))
    if (frac == 0) base + "Z"
    else {
      var f = f"$frac%09d"
      while (f.endsWith("0")) f = f.dropRight(1)
      s"$base.${f}Z"
    }
  }
}

/** `_time` ingest parsing as a codegen-safe expression: string →
  * TimestampType micros (nanos floor-divided — the store's resolution),
  * null when the reference's parser would reject the value, and the
  * CURRENT time for the reference's ""/"0"/"-" "use ingestion time"
  * sentinels (insertutil.ExtractTimestampFromFields). */
case class GoTimestampParse(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_time_parse needs a string input, got ${t.sql}")
  }

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = GoTime.parseIngestNanos(input.asInstanceOf[UTF8String].toString)
    if (v == null) null
    else if (v.longValue() == Long.MinValue)
      System.currentTimeMillis() * 1000L
    else Math.floorDiv(v.longValue(), 1000L)
  }

  override protected def withNewChildInternal(newChild: Expression): GoTimestampParse =
    copy(child = newChild)

  override def prettyName: String = "graft_time_parse"
}
