package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's progressive syslog parser (syslog_parser.go), ported
  * field for field: priority header → priority/facility/severity +
  * keyword companions; version "1 " → RFC5424 with per-token progressive
  * parsing and STRUCTURED DATA ([sd@id k="v"] → `sd@id.k` fields, bare
  * [k=v] → top-level keys, empty [id] → an empty `id` field, `\]`
  * unescaping); anything else → RFC3164 with the year-injected
  * millisecond ISO8601 timestamp in the configured zone and progressive
  * hostname/app_name/proc_id/message. Partial prefixes keep the fields
  * parsed so far — nothing is all-or-nothing. */
case class SyslogParseExpr(child: Expression, currentYear: Int,
                           tzMinutes: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_syslog_parse needs a string input, got ${t.sql}")
  }

  override def dataType: DataType = MapType(StringType, StringType)

  override def nullSafeEval(input: Any): Any = {
    val m = SyslogParse.parse(input.asInstanceOf[UTF8String].toString,
      currentYear, tzMinutes)
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = UTF8String.fromString(e.getValue)
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override protected def withNewChildInternal(c: Expression): SyslogParseExpr =
    copy(child = c)

  override def prettyName: String = "graft_syslog_parse"
}

object SyslogParse {
  private val Months = Map(
    "Jan" -> 1, "Feb" -> 2, "Mar" -> 3, "Apr" -> 4, "May" -> 5, "Jun" -> 6,
    "Jul" -> 7, "Aug" -> 8, "Sep" -> 9, "Oct" -> 10, "Nov" -> 11, "Dec" -> 12)

  private val FacilityKw = Array(
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7")

  private val SeverityKw = Array(
    "emerg", "alert", "critical", "error", "warning", "notice", "info",
    "debug")

  type Fields = java.util.LinkedHashMap[String, String]

  private def put(m: Fields, k: String, v: String): Unit =
    if (!m.containsKey(k)) m.put(k, v)

  def parse(s0: String, currentYear: Int, tzMinutes: Int): Fields = {
    val m = new Fields
    var s = s0
    if (s.isEmpty) return m
    if (s.charAt(0) == '<') {
      val n = s.indexOf('>')
      if (n < 0) return m
      val priorityStr = s.substring(1, n)
      s = s.substring(n + 1)
      put(m, "priority", priorityStr)
      val pri = try Some(java.lang.Long.parseUnsignedLong(priorityStr))
                catch { case _: NumberFormatException => None }
      pri match {
        case None => return m
        case Some(p) =>
          val facility = p / 8
          val severity = p % 8
          put(m, "facility_keyword",
            if (facility < FacilityKw.length) FacilityKw(facility.toInt) else "unknown")
          put(m, "level",
            if (severity < SeverityKw.length) SeverityKw(severity.toInt) else "unknown")
          put(m, "facility", facility.toString)
          put(m, "severity", severity.toString)
      }
    }
    parseNoHeader(m, s, currentYear, tzMinutes)
    m
  }

  private def parseNoHeader(m: Fields, s: String, year: Int, tz: Int): Unit = {
    if (s.isEmpty) return
    if (s.startsWith("1 ")) parseRfc5424(m, s.substring(2))
    else parseRfc3164(m, s, year, tz)
  }

  private def parseRfc5424(m: Fields, s0: String): Unit = {
    put(m, "format", "rfc5424")
    var s = s0
    if (s.isEmpty) return
    def token(name: String): Boolean = {
      val n = s.indexOf(' ')
      if (n < 0) { put(m, name, s); false }
      else { put(m, name, s.substring(0, n)); s = s.substring(n + 1); true }
    }
    if (!token("timestamp")) return
    if (!token("hostname")) return
    if (!token("app_name")) return
    if (!token("proc_id")) return
    if (!token("msg_id")) return
    val tail = parseRfc5424SD(m, s)
    if (tail == null) return
    put(m, "message", tail)
  }

  /** Returns the message tail, or null when SD parsing stopped early. */
  private def parseRfc5424SD(m: Fields, s0: String): String = {
    var s = s0
    if (s.startsWith("- ")) return s.substring(2)
    while (true) {
      val tail = parseRfc5424SDLine(m, s)
      if (tail == null) return null
      s = tail
      if (s.startsWith(" ")) return s.substring(1)
      if (s.isEmpty || s.charAt(0) != '[') return null
    }
    null
  }

  /** One [..] block; returns the remaining string or null on failure. */
  private def parseRfc5424SDLine(m: Fields, s0: String): String = {
    var s = s0
    if (s.isEmpty || s.charAt(0) != '[') return null
    s = s.substring(1)
    val n = indexAny(s, " ]")
    if (n < 0) return null
    var sdId = s.substring(0, n)
    s = s.substring(n)
    val eq = sdId.indexOf('=')
    if (eq >= 0) {
      // special case: the SD-ID itself is `key=value`
      put(m, sdId.substring(0, eq), sdId.substring(eq + 1))
      sdId = ""
    }
    // scan to the closing unescaped ']'
    var i = 0
    while (i < s.length && !(s.charAt(i) == ']' &&
           (i == 0 || s.charAt(i - 1) != '\\'))) {
      if (s.charAt(i) == ' ') i += 1
      else {
        val ne = s.indexOf('=', i)
        if (ne < 0) return null
        i = ne + 1
        if (i < s.length && s.charAt(i) == '"') {
          var valid = false
          i += 1
          while (i < s.length && !valid) {
            if (s.charAt(i) == '"' && s.charAt(i - 1) != '\\') valid = true
            else i += 1
          }
          if (!valid) return null
          i += 1
        } else {
          val nv = indexAny(s.substring(i), " ]")
          if (nv < 0) return null
          i += nv
        }
      }
    }
    if (i == s.length) return null
    val sdValue = s.substring(0, i).replace("\\]", "]").trim
    val sdFields = parseLogfmtSD(sdValue)
    if (sdFields.isEmpty) {
      if (sdId.nonEmpty) put(m, sdId, "")
    } else {
      sdFields.foreach { case (k, v) =>
        if (sdId.isEmpty) put(m, k, v)
        else put(m, sdId + "." + k, v)
      }
    }
    s.substring(i + 1)
  }

  /** logfmtParser.parse (logfmt_parser.go:28): names split on '='/' ',
    * values Go-unquoted when quoted, bare runs otherwise. */
  private def parseLogfmtSD(s0: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def add(k: String, v: String): Unit =
      if (k.nonEmpty || v.nonEmpty) out += ((k, v))
    var s = s0
    if (s.isEmpty) return out.toSeq
    while (true) {
      val n = indexAny(s, "= ")
      if (n < 0) { add(s, ""); return out.toSeq }
      val name = s.substring(0, n)
      val ch = s.charAt(n)
      s = s.substring(n + 1)
      if (ch == ' ') add(name, "")
      else if (s.isEmpty) { add(name, ""); return out.toSeq }
      else {
        val q = tryUnquote(s)
        if (q != null) {
          add(name, q._1)
          s = s.substring(q._2)
          if (s.isEmpty) return out.toSeq
          if (s.charAt(0) != ' ') return out.toSeq
          s = s.substring(1)
        } else {
          val nv = s.indexOf(' ')
          if (nv < 0) { add(name, s); return out.toSeq }
          add(name, s.substring(0, nv))
          s = s.substring(nv + 1)
        }
      }
    }
    out.toSeq
  }

  /** Go strconv.QuotedPrefix+Unquote ("..." / `...`), like the extract
    * pattern matcher. Returns (value, consumed) or null. */
  private def tryUnquote(s: String): (String, Int) = {
    if (s.isEmpty) return null
    s.charAt(0) match {
      case '`' =>
        val end = s.indexOf('`', 1)
        if (end < 0) null else (s.substring(1, end), end + 1)
      case '"' =>
        val sb = new java.lang.StringBuilder
        var i = 1
        while (i < s.length) {
          s.charAt(i) match {
            case '"' => return (sb.toString, i + 1)
            case '\\' if i + 1 < s.length =>
              s.charAt(i + 1) match {
                case 'n' => sb.append('\n'); i += 2
                case 't' => sb.append('\t'); i += 2
                case 'r' => sb.append('\r'); i += 2
                case '\\' => sb.append('\\'); i += 2
                case '"' => sb.append('"'); i += 2
                case '\'' => sb.append('\''); i += 2
                case _ => return null
              }
            case '\n' => return null
            case c => sb.append(c); i += 1
          }
        }
        null
      case _ => null
    }
  }

  private def indexAny(s: String, chars: String): Int = {
    var i = 0
    while (i < s.length) {
      if (chars.indexOf(s.charAt(i)) >= 0) return i
      i += 1
    }
    -1
  }

  private def parseRfc3164(m: Fields, s0: String, year: Int, tz: Int): Unit = {
    put(m, "format", "rfc3164")
    var s = s0
    // time.Stamp = "Jan _2 15:04:05" (15 chars)
    if (s.length < 15) { putMsg(m, s); return }
    val stamp = s.substring(0, 15)
    val parsed = parseStamp(stamp)
    if (parsed == null) { putMsg(m, s); return }
    s = s.substring(15)
    val (mon, day, hh, mm, ss) = (parsed(0), parsed(1), parsed(2), parsed(3), parsed(4))
    // inject the year in the configured zone; roll back a year when the
    // result is more than a day in the future (syslog_parser.go:431-436)
    var ldt = java.time.LocalDateTime.of(year, mon, day, hh, mm, ss)
    val zone = java.time.ZoneOffset.ofTotalSeconds(tz * 60)
    var epoch = ldt.toEpochSecond(zone)
    val nowSec = System.currentTimeMillis() / 1000L
    if (epoch - 24 * 3600 > nowSec) {
      ldt = ldt.minusYears(1)
      epoch = ldt.toEpochSecond(zone)
    }
    val suffix =
      if (tz == 0) "Z"
      else f"${if (tz < 0) "-" else "+"}${math.abs(tz) / 60}%02d:${math.abs(tz) % 60}%02d"
    put(m, "timestamp",
      f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d" +
      f"T${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d.000$suffix")
    if (s.isEmpty || s.charAt(0) != ' ') { if (s.nonEmpty) putMsg(m, s); return }
    s = s.substring(1)
    // hostname
    var n = s.indexOf(' ')
    if (n < 0) { put(m, "hostname", s); return }
    put(m, "hostname", s.substring(0, n))
    s = s.substring(n + 1)
    // tag (app_name)
    n = indexAny(s, "[: ")
    if (n < 0) { put(m, "app_name", s); return }
    put(m, "app_name", s.substring(0, n))
    s = s.substring(n)
    if (s.isEmpty) return
    if (s.charAt(0) == '[') {
      s = s.substring(1)
      n = s.indexOf(']')
      if (n < 0) return
      put(m, "proc_id", s.substring(0, n))
      s = s.substring(n + 1)
    }
    if (s.startsWith(":")) s = s.substring(1)
    if (s.startsWith(" ")) s = s.substring(1)
    if (s.nonEmpty) putMsg(m, s)
  }

  private def putMsg(m: Fields, s: String): Unit = put(m, "message", s)

  /** "Jan _2 15:04:05" → (month, day, hh, mm, ss) or null. */
  private def parseStamp(s: String): Array[Int] = {
    val mon = Months.getOrElse(s.substring(0, 3), -1)
    if (mon < 0 || s.charAt(3) != ' ') return null
    val dayStr = s.substring(4, 6)
    val day =
      try (if (dayStr.charAt(0) == ' ') dayStr.substring(1) else dayStr).toInt
      catch { case _: NumberFormatException => return null }
    if (s.charAt(6) != ' ' || s.charAt(9) != ':' || s.charAt(12) != ':') return null
    try {
      val hh = s.substring(7, 9).toInt
      val mm = s.substring(10, 12).toInt
      val ss = s.substring(13, 15).toInt
      if (day < 1 || day > 31 || hh > 23 || mm > 59 || ss > 59) return null
      Array(mon, day, hh, mm, ss)
    } catch { case _: NumberFormatException => null }
  }

  def parseCol(c: Column, currentYear: Int, tzMinutes: Int): Column = {
    GraftFunctions.ensure()
    call_function("graft_syslog_parse", c, lit(currentYear), lit(tzMinutes))
  }
}
