package graft.logql

/** Shared parsing of LogsQL number literals: plain numbers, underscores,
  * hex, short sizes (5KiB — reference parser.go:3192 tryParseBytes) and
  * durations (1h30m — parser.go:2440 parseDuration, → seconds in numeric
  * contexts). */
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

  private val sizeSuffixes = Seq(
    "kib" -> 1024d, "mib" -> math.pow(1024, 2), "gib" -> math.pow(1024, 3),
    "tib" -> math.pow(1024, 4), "kb" -> 1e3, "mb" -> 1e6, "gb" -> 1e9,
    "tb" -> 1e12, "ki" -> 1024d, "mi" -> math.pow(1024, 2),
    "gi" -> math.pow(1024, 3), "ti" -> math.pow(1024, 4),
    "k" -> 1e3, "m" -> 1e6, "g" -> 1e9, "t" -> 1e12)

  /** Digits with at most one dot — "1..2".toDouble throws, and a raw
    * NumberFormatException would escape the ParseException/400 contract. */
  private def isPlainNumber(s: String): Boolean =
    s.nonEmpty && s.count(_ == '.') <= 1 &&
      s.forall(c => c.isDigit || c == '.') && s.exists(_.isDigit)

  /** Byte sizes, multi-group like the reference's tryParseBytes
    * (values_encoder.go:~550): `22MB100KB` = 22e6+100e3, a trailing
    * suffix-less group must be an integer (`1.5` alone is denied). */
  def sizeValue(s: String): Option[Double] = {
    val ls = s.toLowerCase
    if (ls.isEmpty || !ls(0).isDigit) return None
    var i = 0
    var total = 0d
    var sawSuffix = false
    while (i < ls.length) {
      val numStart = i
      while (i < ls.length && (ls(i).isDigit || ls(i) == '.')) i += 1
      if (i == numStart || !isPlainNumber(ls.substring(numStart, i))) return None
      val num = ls.substring(numStart, i).toDouble
      if (i == ls.length) {
        if (num != math.floor(num)) return None
        total += num
      } else {
        val rest = ls.substring(i)
        sizeSuffixes.find { case (suf, _) => rest.startsWith(suf) } match {
          case Some((suf, mult)) => total += num * mult; i += suf.length; sawSuffix = true
          case None => return None
        }
      }
    }
    if (sawSuffix) Some(total) else None
  }

  /** Duration string → nanos; None if not a duration.
    * Units: ns µs ms s m h d w y; combinations like `1h30m`. */
  def durationNanos(str: String): Option[Long] = {
    val s = str.toLowerCase.replace("_", "")
    if (s.isEmpty || !s(0).isDigit) return None
    var i = 0
    var total = 0d
    while (i < s.length) {
      val numStart = i
      while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
      if (i == numStart) return None
      if (!isPlainNumber(s.substring(numStart, i))) return None
      val num = s.substring(numStart, i).toDouble
      val unitStart = i
      while (i < s.length && !s(i).isDigit) i += 1
      val mult: Double = s.substring(unitStart, i) match {
        case "ns" => 1
        case "µs" | "us" => 1e3
        case "ms" => 1e6
        case "s" => 1e9
        case "m" => 60 * 1e9
        case "h" => 3600 * 1e9
        case "d" => 86400 * 1e9
        case "w" => 7 * 86400 * 1e9
        case "y" => 365 * 86400 * 1e9
        case _ => return None
      }
      total += num * mult
    }
    Some(total.toLong)
  }
}
