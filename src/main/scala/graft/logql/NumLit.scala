package graft.logql

import graft.functions.GoValues

/** Shared parsing of LogsQL number literals: plain numbers, underscores,
  * hex, short byte sizes and durations — the size and duration parsers
  * are exact ports of the reference's tryParseBytes / tryParseDuration
  * (values_encoder.go), pinned by their golden tables in
  * DurationBytesConformanceSpec. Both are CASE-SENSITIVE like the
  * reference: duration units are lowercase (`1m` = one minute), byte
  * suffixes are uppercase (`1M` = 10^6), which is how the reference
  * disambiguates the two. */
object NumLit {
  def parse(raw: String): Option[Double] = {
    val s0 = raw.trim.replace("_", "")
    if (s0.isEmpty) return None
    val neg = s0.startsWith("-")
    val s = if (neg || s0.startsWith("+")) s0.substring(1) else s0
    val v: Option[Double] = s.toLowerCase match {
      case "inf" => Some(Double.PositiveInfinity)
      case "nan" => Some(Double.NaN)
      case ls if ls.startsWith("0x") =>
        try Some(java.lang.Long.parseLong(ls.drop(2), 16).toDouble)
        catch { case _: NumberFormatException => None }
      case ls if ls.startsWith("0b") =>
        try Some(java.lang.Long.parseLong(ls.drop(2), 2).toDouble)
        catch { case _: NumberFormatException => None }
      case ls if ls.startsWith("0o") =>
        try Some(java.lang.Long.parseLong(ls.drop(2), 8).toDouble)
        catch { case _: NumberFormatException => None }
      case _ =>
        sizeValue(s)
          .orElse(durationNanos(s).filter(_ => s.exists(_.isLetter)).map(_ / 1e9))
          .orElse(try Some(s.toDouble) catch { case _: NumberFormatException => None })
    }
    v.map(x => if (neg) -x else x)
  }

  /** addInt64NoOverflow (values_encoder.go:968): per-group float→int64
    * truncation, MaxInt64 clamp on overflow or negative group. */
  private def addNoOverflow(n: Long, f: Double): Long = {
    val x = f.toLong // saturates like Go's clamp path resolves to
    if (n < 0 || x < 0 || x > Long.MaxValue - n) Long.MaxValue else n + x
  }

  /** tryParseFloat64Prefix: the leading digits/dot/underscore run parsed
    * as a lossy float. Returns (value, restIdx) or null. */
  private def floatPrefix(s: String, from: Int): (java.lang.Double, Int) = {
    var i = from
    while (i < s.length && {
      val c = s.charAt(i); (c >= '0' && c <= '9') || c == '.' || c == '_'
    }) i += 1
    if (i == from) return (null, from)
    (GoValues.parseFloat64(s.substring(from, i)), i)
  }

  /** Byte sizes — exact tryParseBytes port (values_encoder.go:~550):
    * case-sensitive `B K M G T KB.. KiB.. Ki..` suffix groups, each group
    * float-parsed then int64-truncated, MaxInt64 clamp; a suffix-less
    * group must be an integer; leading minus negates the clamped sum. */
  def sizeLong(str: String): Option[Long] = {
    if (str.isEmpty) return None
    val minus = str.charAt(0) == '-'
    val s = if (minus) str.substring(1) else str
    if (s.isEmpty) return None
    var n = 0L
    var i = 0
    val sufs = Seq( // longest first, like the reference's length ladder
      "KiB" -> 1024d, "MiB" -> math.pow(1024, 2), "GiB" -> math.pow(1024, 3),
      "TiB" -> math.pow(1024, 4),
      "Ki" -> 1024d, "Mi" -> math.pow(1024, 2), "Gi" -> math.pow(1024, 3),
      "Ti" -> math.pow(1024, 4),
      "KB" -> 1e3, "MB" -> 1e6, "GB" -> 1e9, "TB" -> 1e12,
      "B" -> 1d, "K" -> 1e3, "M" -> 1e6, "G" -> 1e9, "T" -> 1e12)
    while (i < s.length) {
      val (f, j) = floatPrefix(s, i)
      if (f == null) return None
      i = j
      if (i == s.length) {
        // deny floating-point numbers without any suffix
        if (f.doubleValue() != math.floor(f.doubleValue())) return None
        n = addNoOverflow(n, f)
      } else {
        sufs.find { case (suf, _) => s.startsWith(suf, i) } match {
          case Some((suf, mult)) =>
            n = addNoOverflow(n, f * mult); i += suf.length
          case None => return None
        }
      }
    }
    Some(if (minus) -n else n)
  }

  /** Suffix-REQUIRED wrapper for callers that use byte sizes to DETECT
    * size literals (bare integers go down the plain-number path) —
    * tryParseBytes itself accepts bare integers, which [[sizeLong]]
    * preserves for conformance. */
  def sizeValue(s: String): Option[Double] =
    if (s.exists(_.isLetter)) sizeLong(s).map(_.toDouble) else None

  /** Duration string → nanos — exact tryParseDuration port
    * (values_encoder.go:900+): case-sensitive lowercase units
    * (ns µs ms s m h d w y), per-group float parse then int64
    * truncation, MaxInt64 clamp (so the negated minimum is
    * -MaxInt64), leading minus negates the sum. */
  def durationNanos(str: String): Option[Long] = {
    if (str.isEmpty) return None
    val minus = str.charAt(0) == '-'
    val s = if (minus) str.substring(1) else str
    if (s.isEmpty) return None
    var nsecs = 0L
    var i = 0
    while (i < s.length) {
      val (f, j) = floatPrefix(s, i)
      if (f == null) return None
      i = j
      if (i >= s.length) return None // a unit suffix is mandatory
      if (s.startsWith("µs", i)) { nsecs = addNoOverflow(nsecs, f * 1e3); i += 2 }
      else if (s.startsWith("us", i)) { nsecs = addNoOverflow(nsecs, f * 1e3); i += 2 }
      else if (s.startsWith("ms", i)) { nsecs = addNoOverflow(nsecs, f * 1e6); i += 2 }
      else if (s.startsWith("ns", i)) { nsecs = addNoOverflow(nsecs, f); i += 2 }
      else if (s.startsWith("y", i)) { nsecs = addNoOverflow(nsecs, f * 365d * 86400 * 1e9); i += 1 }
      else if (s.startsWith("w", i)) { nsecs = addNoOverflow(nsecs, f * 7d * 86400 * 1e9); i += 1 }
      else if (s.startsWith("d", i)) { nsecs = addNoOverflow(nsecs, f * 86400 * 1e9); i += 1 }
      else if (s.startsWith("h", i)) { nsecs = addNoOverflow(nsecs, f * 3600 * 1e9); i += 1 }
      else if (s.startsWith("m", i)) { nsecs = addNoOverflow(nsecs, f * 60 * 1e9); i += 1 }
      else if (s.startsWith("s", i)) { nsecs = addNoOverflow(nsecs, f * 1e9); i += 1 }
      else return None
    }
    Some(if (minus) -nsecs else nsecs)
  }
}
