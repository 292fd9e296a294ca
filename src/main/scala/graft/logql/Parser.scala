package graft.logql

import scala.collection.mutable.ArrayBuffer

/** Recursive-descent LogsQL parser.
  *
  * Grammar follows the reference (lib/logstorage/parser.go): a query is
  * `<filter> | pipe1 | pipe2 ...`; filters combine with implicit AND,
  * explicit `and`/`or`/`not`/`!`, parentheses, `field:rhs` forms and
  * function-style filters. Time literals are lexed context-sensitively
  * (they contain `:'`), so the parser works over the raw string.
  *
  * @param now query-evaluation timestamp (epoch nanos) used to resolve
  *            relative time filters like `_time:5m`.
  */
final class Parser(input: String, now: Long) {
  private var pos = 0

  // ------------------------------------------------------------------ lexing

  private def err(msg: String): Nothing = throw ParseException(msg, pos)

  private def skipWs(): Unit = {
    while (pos < input.length && input(pos).isWhitespace) pos += 1
    // line comments: `# ...` to end of line
    if (pos < input.length && input(pos) == '#') {
      while (pos < input.length && input(pos) != '\n') pos += 1
      skipWs()
    }
  }

  private def peekCh: Char = if (pos < input.length) input(pos) else '\u0000'
  private def eof: Boolean = { skipWs(); pos >= input.length }

  /** Chars that terminate an unquoted word. */
  private def isWordEnd(c: Char): Boolean =
    c.isWhitespace || "(){}[]|,:=!\"'`<>~".indexOf(c) >= 0

  private def readWord(): String = {
    skipWs()
    val start = pos
    while (pos < input.length && !isWordEnd(input(pos))) pos += 1
    if (pos == start) err(s"expected word, got '${peekCh}'")
    input.substring(start, pos)
  }

  /** Word that may embed `*` wildcards and `.` etc.; already covered by
    * readWord since `*` is not a terminator. */
  private def readQuoted(): String = {
    skipWs()
    val q = peekCh
    if (q != '"' && q != '\'' && q != '`') err("expected quoted string")
    pos += 1
    val sb = new StringBuilder
    if (q == '`') {
      while (pos < input.length && input(pos) != '`') { sb += input(pos); pos += 1 }
      if (pos >= input.length) err("unterminated backquoted string")
      pos += 1
      return sb.result()
    }
    while (pos < input.length && input(pos) != q) {
      val c = input(pos)
      if (c == '\\' && pos + 1 < input.length) {
        input(pos + 1) match {
          case 'n' => sb += '\n'; pos += 2
          case 't' => sb += '\t'; pos += 2
          case 'r' => sb += '\r'; pos += 2
          case '\\' => sb += '\\'; pos += 2
          case '"' => sb += '"'; pos += 2
          case '\'' => sb += '\''; pos += 2
          case 'u' if pos + 5 < input.length =>
            sb += hexEscape(input.substring(pos + 2, pos + 6), pos).toChar
            pos += 6
          case 'x' if pos + 3 < input.length =>
            // Go-style hex byte escape (LogsQL.md:4132: `\x8c` etc.)
            sb += hexEscape(input.substring(pos + 2, pos + 4), pos).toChar
            pos += 4
          case other => // unknown escape: keep the backslash (regex \w, \d …)
            sb += '\\'; sb += other; pos += 2
        }
      } else { sb += c; pos += 1 }
    }
    if (pos >= input.length) err("unterminated quoted string")
    pos += 1
    sb.result()
  }

  /** Malformed hex in a \\u/\\x escape is a parse error (→ HTTP 400),
    * not a NumberFormatException escaping to the server as a 500.
    * Every char must be a hex digit — parseInt alone would also accept
    * the sign prefixes '+'/'-', which Go's escape grammar rejects. */
  private def hexEscape(hex: String, at: Int): Int = {
    if (!hex.forall(c => Character.digit(c, 16) >= 0))
      err(s"invalid hex escape \\$hex at offset $at")
    Integer.parseInt(hex, 16)
  }

  private def isQuote(c: Char): Boolean = c == '"' || c == '\'' || c == '`'

  /** A field name or plain value: quoted string or word. */
  private def readToken(): String = {
    skipWs()
    if (isQuote(peekCh)) readQuoted() else readWord()
  }

  /** Returns (value, wasQuoted). */
  private def readTokenQ(): (String, Boolean) = {
    skipWs()
    if (isQuote(peekCh)) (readQuoted(), true) else (readWord(), false)
  }

  private def consume(c: Char): Boolean = {
    skipWs()
    if (peekCh == c) { pos += 1; true } else false
  }

  private def expect(c: Char): Unit =
    if (!consume(c)) err(s"expected '$c', got '${peekCh}'")

  /** Case-insensitive keyword match at a word boundary. */
  private def peekKeyword(kw: String): Boolean = {
    skipWs()
    val end = pos + kw.length
    end <= input.length &&
      input.substring(pos, end).equalsIgnoreCase(kw) &&
      (end == input.length || isWordEnd(input(end)))
  }

  private def consumeKeyword(kw: String): Boolean = {
    if (peekKeyword(kw)) { pos += kw.length; true } else false
  }

  /** Raw read until one of the stop chars (for time bounds etc.); trimmed. */
  private def readUntil(stops: String): String = {
    skipWs()
    val start = pos
    while (pos < input.length && stops.indexOf(input(pos)) < 0) pos += 1
    input.substring(start, pos).trim
  }

  // ------------------------------------------------------------------ query

  // pipe subqueries (join/union) recurse parseQuery→parsePipe→parseQuery
  // without a live parseTerm frame on the stack, so they need the same
  // depth cap the filter grammar has — "* | union (* | union (…" at
  // thousands of levels is a StackOverflowError otherwise
  def parseQuery(): Query = {
    termDepth += 1
    if (termDepth > MaxTermDepth)
      err(s"query nesting deeper than $MaxTermDepth")
    try parseQuery0() finally termDepth -= 1
  }

  // options inherit into subqueries, overridable per level, like the
  // reference's opts propagation (a subquery sees its parent's
  // ignore_global_time_filter unless it declares its own)
  private var inheritedOpts: Map[String, String] = Map.empty

  private def parseQuery0(): Query = {
    // leading `options (k=v, ...)` (parser.go:261-285 queryOptions:
    // concurrency, ignore_global_time_filter) — recorded on the query;
    // ignore_global_time_filter is honored by the HTTP layer, concurrency
    // is advisory (Spark's scheduler owns worker counts)
    val opts = scala.collection.mutable.Map.empty[String, String]
    if (peekKeyword("options")) {
      // commit to the clause only for a genuine `(k=v, ...)` list — the
      // word `options` followed by a paren FILTER group (`options (error
      // or warn)`) must keep parsing as filters
      val save = pos
      pos += "options".length
      skipWs()
      var ok = false
      if (peekCh == '(') {
        try {
          pos += 1
          skipWs()
          if (peekCh == ')') { pos += 1; ok = true }
          else {
            val k0 = readToken()
            skipWs()
            if (peekCh == '=') {
              pos += 1
              opts(k0) = readToken()
              while (consume(',')) {
                val k = readToken(); expect('='); opts(k) = readToken()
              }
              expect(')')
              ok = true
            }
          }
        } catch { case _: ParseException => ok = false }
      }
      if (!ok) { pos = save; opts.clear() }
      else opts.keys.find(k =>
        k != "concurrency" && k != "ignore_global_time_filter").foreach(k =>
        err(s"unknown query option '$k'")) // reference rejects unknown options
    }
    val effectiveOpts = inheritedOpts ++ opts.toMap
    val prevInherited = inheritedOpts
    inheritedOpts = effectiveOpts
    try {
      val f = parseOr("_msg")
      val pipes = ArrayBuffer.empty[Pipe]
      skipWs()
      while (consume('|')) { pipes += parsePipe(); skipWs() }
      Query(f, pipes.toSeq, effectiveOpts)
    } finally inheritedOpts = prevInherited
  }

  /** Parse a complete standalone query (must consume the whole input). */
  def parseQueryFull(): Query = {
    val q = parseQuery()
    skipWs()
    if (pos < input.length) err(s"unexpected trailing input: '${input.substring(pos)}'")
    q
  }

  // ---------------------------------------------------------------- filters

  private def filterTermAhead: Boolean = {
    skipWs()
    val c = peekCh
    c != '\u0000' && c != '|' && c != ')' && c != ',' && !peekKeyword("or")
  }

  private def parseOr(defaultField: String): Filter = {
    val parts = ArrayBuffer(parseAnd(defaultField))
    while (consumeKeyword("or")) parts += parseAnd(defaultField)
    if (parts.size == 1) parts.head else Filter.Or(parts.toSeq)
  }

  private def parseAnd(defaultField: String): Filter = {
    val parts = ArrayBuffer.empty[Filter]
    var continue = true
    while (continue) {
      consumeKeyword("and") // explicit AND is optional noise
      parts += parseTerm(defaultField)
      continue = filterTermAhead
    }
    if (parts.size == 1) parts.head else Filter.And(parts.toSeq)
  }

  // every recursion cycle of the filter grammar (parens, !-chains,
  // subqueries) passes through parseTerm — a depth cap turns a
  // pathologically nested query ("(((((..." ) into a ParseException/400
  // instead of a StackOverflowError killing the server thread
  private var termDepth = 0
  private val MaxTermDepth = 300

  private def parseTerm(defaultField: String): Filter = {
    termDepth += 1
    if (termDepth > MaxTermDepth)
      err(s"filter nesting deeper than $MaxTermDepth")
    try parseTerm0(defaultField) finally termDepth -= 1
  }

  private def parseTerm0(defaultField: String): Filter = {
    skipWs()
    peekCh match {
      case '!' => pos += 1; Filter.Not(parseTerm(defaultField))
      case '-' if pos + 1 < input.length && !input(pos + 1).isDigit &&
                  !input(pos + 1).isWhitespace =>
        pos += 1; Filter.Not(parseTerm(defaultField))
      case '(' =>
        pos += 1
        val f = parseOr(defaultField)
        expect(')')
        f
      case '{' => parseStreamFilter()
      case '*' =>
        pos += 1
        if (defaultField == "_msg") Filter.Noop else Filter.Prefix(defaultField, "")
      case '=' => // `:=value` with defaultField propagated from `field:(...)`
        pos += 1
        parseExactRhs(defaultField)
      case '>' | '<' => parseCompareRhs(defaultField)
      case '~' =>
        pos += 1
        Filter.Regexp(defaultField, readToken())
      case c if isQuote(c) =>
        val s = readQuoted()
        if (consume('*')) Filter.Prefix(defaultField, s)
        else if (peekCh == ':') { pos += 1; parseFilterRhs(s) }
        else Filter.Phrase(defaultField, s)
      case _ =>
        if (consumeKeyword("not")) return Filter.Not(parseTerm(defaultField))
        val w = readWord()
        if (peekCh == ':') { pos += 1; parseFilterRhs(w) }
        // bare filter functions apply to the default field —
        // `seq("a", "b")`, `len_range(5, 10)`, `contains_all(foo, "x")`
        // (LogsQL.md uses the fieldless forms throughout); same adjacency
        // rule as the field-prefixed path: `word (group)` stays an AND
        else if ((peekCh == '(' || (peekCh == '[' && w.equalsIgnoreCase("range"))) &&
                 Parser.filterFuncs(w.toLowerCase))
          parseFuncFilter(defaultField, w.toLowerCase)
        else wordFilter(defaultField, w)
    }
  }

  private def wordFilter(field: String, w: String): Filter =
    if (w == "*") Filter.Noop
    else if (w.endsWith("*")) Filter.Prefix(field, w.dropRight(1))
    else Filter.Phrase(field, w)

  /** After `field:` — dispatch on the right-hand side. */
  private def parseFilterRhs(field: String): Filter = {
    skipWs()
    if (field == "_time") return parseTimeFilter()
    if (field == "_stream_id") return parseStreamIdFilter()
    if (field == "_stream") return parseStreamFilter()
    peekCh match {
      case '=' => pos += 1; parseExactRhs(field)
      case '~' => pos += 1; Filter.Regexp(field, readToken())
      case '>' | '<' => parseCompareRhs(field)
      case '(' => pos += 1; val f = parseOr(field); expect(')'); f
      case '*' => pos += 1; Filter.Prefix(field, "")
      case c if isQuote(c) =>
        val s = readQuoted()
        if (consume('*')) Filter.Prefix(field, s) else Filter.Phrase(field, s)
      case _ =>
        val w = readWord()
        // function form only when '(' is adjacent and the name is known —
        // `f:word (other)` is an implicit AND with a group, not a call.
        // range additionally accepts '[' (inclusive bound).
        if ((peekCh == '(' || (peekCh == '[' && w.equalsIgnoreCase("range"))) &&
            Parser.filterFuncs(w.toLowerCase))
          parseFuncFilter(field, w.toLowerCase)
        else wordFilter(field, w)
    }
  }

  private def parseExactRhs(field: String): Filter = {
    val (v, quoted) = readTokenQ()
    if (consume('*')) Filter.ExactPrefix(field, v)
    else if (!quoted && v.endsWith("*")) Filter.ExactPrefix(field, v.dropRight(1))
    else Filter.Exact(field, v)
  }

  private def parseCompareRhs(field: String): Filter = {
    val op = new StringBuilder
    op += input(pos); pos += 1
    if (peekCh == '=') { op += '='; pos += 1 }
    val raw = readToken()
    if (raw.isEmpty)
      err("missing comparison operand") // a truncated query must not
        // degrade into a match-nearly-everything string range
    NumLit.parse(raw) match {
      case Some(n) => op.result() match {
        case ">"  => Filter.Range(field, n, Double.PositiveInfinity, inclLo = false, inclHi = true)
        case ">=" => Filter.Range(field, n, Double.PositiveInfinity, inclLo = true, inclHi = true)
        case "<"  => Filter.Range(field, Double.NegativeInfinity, n, inclLo = true, inclHi = false)
        case "<=" => Filter.Range(field, Double.NegativeInfinity, n, inclLo = true, inclHi = true)
        case o    => err(s"unsupported comparison '$o'")
      }
      case None =>
        // non-numeric operand: string-ordering compare, desugared to a
        // string_range like the reference (tryParseFilterGTString/LTString,
        // parser.go:2182-2217 — a trailing NUL flips bound inclusivity;
        // the "unbounded" max mirrors maxStringRangeValue's best-effort
        // sentinel, filter_string_range.go:9)
        val MaxStr = Filter.MaxStringRange
        op.result() match {
          case ">"  => Filter.StringRange(field, raw + "\u0000", MaxStr)
          case ">=" => Filter.StringRange(field, raw, MaxStr)
          case "<"  => Filter.StringRange(field, "", raw)
          case "<=" => Filter.StringRange(field, "", raw + "\u0000")
          case o    => err(s"unsupported comparison '$o'")
        }
    }
  }

  /** Optional `if (<filters>)` clause on a pipe (if_filter.go:55). */
  private def parseOptIf(): Option[Filter] =
    if (consumeKeyword("if")) {
      expect('(')
      val f = parseOr("_msg")
      expect(')')
      Some(f)
    } else None

  /** Looks ahead for a top-level '|' inside the upcoming (...) group. */
  private def peeksLikeSubquery(): Boolean = {
    skipWs()
    if (peekCh != '(') return false
    var i = pos + 1
    var depth = 1
    var quote = '\u0000'
    while (i < input.length && depth > 0) {
      val c = input(i)
      if (quote != '\u0000') {
        if (c == quote && input(i - 1) != '\\') quote = '\u0000'
      } else c match {
        case '"' | '\'' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case '|' if depth == 1 => return true
        case _ =>
      }
      i += 1
    }
    false
  }

  /** Function-style filters: in(...), seq(...), range(...), etc. */
  private def parseFuncFilter(field: String, fn: String): Filter = fn match {
    case "in" =>
      // `in(subquery)` vs `in(v1, ..., vN)`: a '|' at paren depth 1 means a
      // piped subquery (reference distinguishes the same way — a query
      // producing one result column via `| fields f`)
      if (peeksLikeSubquery()) {
        expect('(')
        val sub = parseQuery()
        expect(')')
        Filter.InQuery(field, sub)
      } else Filter.In(field, parseArgList())
    case "contains_all" =>
      if (peeksLikeSubquery()) {
        expect('('); val sub = parseQuery(); expect(')')
        Filter.ContainsQuery(field, sub, all = true)
      } else Filter.ContainsAll(field, parseArgList())
    case "contains_any" =>
      if (peeksLikeSubquery()) {
        expect('('); val sub = parseQuery(); expect(')')
        Filter.ContainsQuery(field, sub, all = false)
      } else Filter.ContainsAny(field, parseArgList())
    case "seq" => Filter.Sequence(field, parseArgList())
    case "re" => val a = parseArgList(); Filter.Regexp(field, a.headOption.getOrElse(""))
    case "i" =>
      expect('(')
      val (v, quoted) = readTokenQ()
      val f =
        if (consume('*')) Filter.AnyCasePrefix(field, v)
        else if (!quoted && v.endsWith("*")) Filter.AnyCasePrefix(field, v.dropRight(1))
        else if (v == "*") Filter.Prefix(field, "")
        else Filter.AnyCasePhrase(field, v)
      expect(')')
      f
    case "range" =>
      skipWs()
      val inclLo = peekCh == '['
      if (peekCh != '(' && peekCh != '[') err("range expects ( or [")
      pos += 1
      val lo = parseNumberToken()
      expect(',')
      val hi = parseNumberToken()
      skipWs()
      val inclHi = peekCh == ']'
      if (peekCh != ')' && peekCh != ']') err("range expects ) or ]")
      pos += 1
      Filter.Range(field, lo, hi, inclLo, inclHi)
    case "ipv4_range" =>
      val args = parseArgList()
      args match {
        case Seq(single) if single.contains("/") =>
          val Array(ipStr, bitsStr) = single.split("/", 2)
          val ip = ipv4ToLong(ipStr)
          // bits > 32 would shift by a negative amount (masked mod 64 →
          // mask 0 → match-all); non-numeric would NFE past the parse
          // error contract — both are malformed CIDR, reject loudly
          val bits = bitsStr.toIntOption
            .filter(b => b >= 0 && b <= 32)
            .getOrElse(err(s"bad CIDR suffix '/$bitsStr' (want 0-32)"))
          val mask = if (bits == 0) 0L else (0xffffffffL << (32 - bits)) & 0xffffffffL
          Filter.Ipv4Range(field, ip & mask, (ip & mask) | (~mask & 0xffffffffL))
        case Seq(single) => val ip = ipv4ToLong(single); Filter.Ipv4Range(field, ip, ip)
        case Seq(lo, hi) => Filter.Ipv4Range(field, ipv4ToLong(lo), ipv4ToLong(hi))
        case _ => err("ipv4_range expects 1 or 2 args")
      }
    case "string_range" =>
      val args = parseArgList()
      if (args.size != 2) err("string_range expects 2 args")
      Filter.StringRange(field, args(0), args(1))
    case "len_range" =>
      val args = parseArgList()
      if (args.size != 2) err("len_range expects 2 args")
      Filter.LenRange(field, parseNumberLiteral(args(0)).toLong,
                      parseNumberLiteral(args(1)).toLong)
    case "value_type" => Filter.ValueType(field, oneArg("value_type"))
    case "eq_field" => Filter.EqField(field, oneArg("eq_field"))
    case "le_field" => Filter.LeField(field, oneArg("le_field"))
    case "lt_field" => Filter.LtField(field, oneArg("lt_field"))
    case "day_range" => err("day_range is only valid on _time")
    case other => err(s"unknown filter function '$other'")
  }

  /** Exactly-one-argument helper: `.head` on an empty list would throw
    * NoSuchElementException past the ParseException/400 contract. */
  private def oneArg(fn: String): String = {
    val args = parseArgList()
    if (args.size != 1) err(s"$fn expects exactly 1 argument")
    args.head
  }

  private def parseArgList(): Seq[String] = {
    expect('(')
    val args = ArrayBuffer.empty[String]
    skipWs()
    if (peekCh != ')') {
      args += readToken()
      while (consume(',')) args += readToken()
    }
    expect(')')
    args.toSeq
  }

  private def ipv4ToLong(s: String): Long = {
    val parts = s.trim.split("\\.")
    if (parts.length != 4) err(s"bad ipv4 '$s'")
    parts.foldLeft(0L) { (acc, p) =>
      val octet = p.toIntOption.filter(o => o >= 0 && o <= 255)
        .getOrElse(err(s"bad ipv4 '$s'")) // NFE / >255 must be a parse error
      (acc << 8) | octet
    }
  }

  // ------------------------------------------------------------ number lits

  /** Number with optional short-size/duration suffix (parser.go:3192
    * tryParseBytes, :2440 parseDuration): 5KiB, 10M, 1h30m, inf. */
  private def parseNumberToken(): Double = parseNumberLiteral(readToken())

  def parseNumberLiteral(raw: String): Double =
    NumLit.parse(raw).getOrElse(err(s"bad number '$raw'"))

  def durationNanos(str: String): Option[Long] = NumLit.durationNanos(str)

  // ------------------------------------------------------------ time filter

  private def parseTimeFilter(): Filter = {
    val f = parseTimeFilterInner()
    // `_time:5m offset 1h` (parser.go:2598-2608): shift the whole window
    // back by the duration. Without this the two words fell through to
    // the _msg phrase parser and silently matched nothing.
    if (consumeKeyword("offset")) {
      val d = durationNanos(readTimeWord())
        .getOrElse(err("bad duration after 'offset'"))
      f match {
        case Filter.TimeRange(lo, hi) =>
          Filter.TimeRange(if (lo == Long.MinValue) lo else lo - d,
                           if (hi == Long.MaxValue) hi else hi - d)
        case dr: Filter.DayRange => dr.copy(offsetNs = d)
        case wr: Filter.WeekRange => wr.copy(offsetNs = d)
        case other => other
      }
    } else f
  }

  private def parseTimeFilterInner(): Filter = {
    skipWs()
    peekCh match {
      case '[' | '(' =>
        val inclLo = peekCh == '['
        pos += 1
        val loS = readUntil(",")
        expect(',')
        val hiS = readUntil(")]")
        skipWs()
        val inclHi = peekCh == ']'
        pos += 1
        val (lo1, _) = parseTimeBound(loS)
        val (hi1, hi2) = parseTimeBound(hiS)
        val lo = if (inclLo) lo1 else hi2min(parseTimeBound(loS)._2, Long.MaxValue)
        val hi = if (inclHi) hi2 else hi1
        Filter.TimeRange(lo, hi)
      case '>' =>
        pos += 1
        val incl = consume('=')
        val (b1, b2) = parseTimeBound(readTimeWord())
        Filter.TimeRange(if (incl) b1 else b2, Long.MaxValue)
      case '<' =>
        pos += 1
        val incl = consume('=')
        val (b1, b2) = parseTimeBound(readTimeWord())
        Filter.TimeRange(Long.MinValue, if (incl) b2 else b1)
      case _ =>
        val w = readTimeWord()
        skipWs()
        if (peekCh == '(' && w.equalsIgnoreCase("day_range")) return parseDayRange()
        if (peekCh == '[' && w.equalsIgnoreCase("day_range")) return parseDayRange()
        if (peekCh == '(' && w.equalsIgnoreCase("week_range")) return parseWeekRange()
        if (peekCh == '[' && w.equalsIgnoreCase("week_range")) return parseWeekRange()
        durationNanos(w) match {
          case Some(d) => Filter.TimeRange(now - d, now + 1) // last-d window
          case None =>
            val (b1, b2) = parseTimeBound(w)
            Filter.TimeRange(b1, b2)
        }
    }
  }

  private def hi2min(a: Long, b: Long): Long = math.min(a, b)

  /** Time words may contain ':' so read raw until delimiter. */
  private def readTimeWord(): String = {
    skipWs()
    if (isQuote(peekCh)) return readQuoted()
    val start = pos
    while (pos < input.length && !input(pos).isWhitespace &&
           "(){}[]|,".indexOf(input(pos)) < 0) pos += 1
    input.substring(start, pos)
  }

  /** Parse an ISO8601-ish bound at its precision → [startNs, endNs) window. */
  def parseTimeBound(s0: String): (Long, Long) = {
    val s = s0.trim
    if (s.isEmpty) err("empty time bound")
    if (s.equalsIgnoreCase("now")) return (now, now)
    durationNanos(s) match { // offset like `-1h` handled by caller; bare durations invalid here
      case Some(_) if s(0).isDigit && !s.contains("-") && s.exists(_.isLetter) =>
        err(s"unexpected duration '$s' as time bound")
      case _ =>
    }
    // Unix seconds/millis/nanos
    if (s.forall(c => c.isDigit) && s.length >= 10) {
      val v = s.toLong
      val ns = s.length match {
        case 10 => v * 1000000000L
        case 13 => v * 1000000L
        case 16 => v * 1000L
        case _ => v
      }
      return (ns, ns + 1)
    }
    // ISO8601 prefix: YYYY[-MM[-DD[THH[:MM[:SS[.sss]]]]]][Z|±hh:mm]
    var str = s
    var tzOffsetNs = 0L
    if (str.endsWith("Z") || str.endsWith("z")) str = str.dropRight(1)
    else {
      val tzIdx = math.max(str.lastIndexOf('+'), str.indexOf('T') match {
        case -1 => -1
        case t => str.lastIndexOf('-') match { case i if i > t => i; case _ => -1 }
      })
      if (tzIdx > 0) {
        val tz = str.substring(tzIdx)
        val m = "([+-])(\\d{2}):?(\\d{2})".r
        tz match {
          case m(sign, hh, mm) =>
            tzOffsetNs = (hh.toLong * 3600 + mm.toLong * 60) * 1000000000L
            if (sign == "+") tzOffsetNs = -tzOffsetNs
            str = str.substring(0, tzIdx)
          case _ =>
        }
      }
    }
    import java.time._
    def ns(dt: LocalDateTime): Long =
      dt.toEpochSecond(ZoneOffset.UTC) * 1000000000L + dt.getNano + tzOffsetNs
    val datePart :: timeParts = str.split("T", 2).toList: @unchecked
    val dp = datePart.split("-")
    try {
      (dp.length, timeParts) match {
        case (1, Nil) =>
          val y = dp(0).toInt
          (ns(LocalDateTime.of(y, 1, 1, 0, 0)), ns(LocalDateTime.of(y + 1, 1, 1, 0, 0)))
        case (2, Nil) =>
          val d0 = LocalDateTime.of(dp(0).toInt, dp(1).toInt, 1, 0, 0)
          (ns(d0), ns(d0.plusMonths(1)))
        case (3, Nil) =>
          val d0 = LocalDateTime.of(dp(0).toInt, dp(1).toInt, dp(2).toInt, 0, 0)
          (ns(d0), ns(d0.plusDays(1)))
        case (3, t :: Nil) =>
          val tp = t.split(":")
          val d = LocalDate.of(dp(0).toInt, dp(1).toInt, dp(2).toInt)
          tp.length match {
            case 1 =>
              val d0 = d.atTime(tp(0).toInt, 0)
              (ns(d0), ns(d0.plusHours(1)))
            case 2 =>
              val d0 = d.atTime(tp(0).toInt, tp(1).toInt)
              (ns(d0), ns(d0.plusMinutes(1)))
            case 3 if tp(2).contains(".") =>
              val Array(sec, frac) = tp(2).split("\\.", 2)
              val fracNs = (frac + "0" * (9 - frac.length)).take(9).toLong
              val d0 = d.atTime(tp(0).toInt, tp(1).toInt, sec.toInt).plusNanos(fracNs)
              (ns(d0), ns(d0.plusNanos(math.pow(10, 9 - frac.length).toLong)))
            case _ =>
              val d0 = d.atTime(tp(0).toInt, tp(1).toInt, tp(2).toInt)
              (ns(d0), ns(d0.plusSeconds(1)))
          }
        case _ => err(s"bad time bound '$s0'")
      }
    } catch {
      case _: NumberFormatException | _: DateTimeException => err(s"bad time bound '$s0'")
    }
  }

  private def parseDayRange(): Filter = {
    skipWs()
    val inclStart = peekCh == '['
    pos += 1
    val a = readUntil(",")
    expect(',')
    val b = readUntil(")]")
    skipWs()
    val inclEnd = peekCh == ']'
    pos += 1
    def minutes(s: String): Int = {
      val p = s.trim.split(":")
      def num(x: String): Int =
        x.toIntOption.getOrElse(err(s"bad day_range time '$s'"))
      num(p(0)) * 60 + (if (p.length > 1) num(p(1)) else 0)
    }
    Filter.DayRange(minutes(a), minutes(b), inclStart, inclEnd)
  }

  private def parseWeekRange(): Filter = {
    skipWs()
    val inclStart = peekCh == '['
    pos += 1
    val a = readUntil(",")
    expect(',')
    val b = readUntil(")]")
    skipWs()
    val inclEnd = peekCh == ']'
    pos += 1
    def dow(s: String): Int = s.trim.toLowerCase.take(3) match {
      case "sun" => 0; case "mon" => 1; case "tue" => 2; case "wed" => 3
      case "thu" => 4; case "fri" => 5; case "sat" => 6
      case other => err(s"bad day of week '$other'")
    }
    Filter.WeekRange(dow(a), dow(b), inclStart, inclEnd)
  }

  private def parseStreamIdFilter(): Filter = {
    skipWs()
    if (peekCh == 'i' && peekKeyword("in")) {
      pos += 2
      // `_stream_id:in(<subquery>)` builds the id set from a query
      // (filter_stream_id.go:28-40) — same compile paths as field in(q):
      // top-level conjunct → semi-join, nested → capped materialization
      if (peeksLikeSubquery()) {
        expect('('); val sub = parseQuery(); expect(')')
        Filter.InQuery("_stream_id", sub)
      } else Filter.StreamId(parseArgList())
    } else Filter.StreamId(Seq(readToken()))
  }

  private def parseStreamFilter(): Filter = {
    expect('{')
    val groups = ArrayBuffer.empty[Seq[StreamMatcher]]
    val cur = ArrayBuffer.empty[StreamMatcher]
    var done = false
    while (!done) {
      skipWs()
      if (peekCh == '}') { pos += 1; done = true }
      else {
        val label = readToken()
        skipWs()
        val op = peekCh match {
          case '=' =>
            pos += 1
            if (peekCh == '~') { pos += 1; "=~" } else "="
          case '!' =>
            pos += 1
            peekCh match {
              case '=' => pos += 1; "!="
              case '~' => pos += 1; "!~"
              case _ => err("bad stream matcher op")
            }
          case _ => err("bad stream matcher op")
        }
        val v = readToken()
        cur += StreamMatcher(label, op, v)
        skipWs()
        if (consumeKeyword("or")) { groups += cur.toSeq; cur.clear() }
        else consume(',')
      }
    }
    if (cur.nonEmpty) groups += cur.toSeq
    Filter.Stream(groups.toSeq)
  }

  // ------------------------------------------------------------------ pipes

  private def parsePipe(): Pipe = {
    skipWs()
    val pipeStart = pos
    // a pipe may start with a non-word token (`| "phrase"`, `| ~"re"`) —
    // those go straight to the bare-filter fallback below, like the
    // reference's default branch (pipe.go:368-380)
    val name = try readWord().toLowerCase catch {
      case _: ParseException => return barePipe(pipeStart, s"'${peekCh}'")
    }
    name match {
      case "fields" | "keep" => Pipe.Fields(parseFieldList())
      case "delete" | "del" | "drop" | "rm" => Pipe.Delete(parseFieldList())
      case "copy" | "cp" => Pipe.Copy(parseAsPairs())
      case "rename" | "mv" => Pipe.Rename(parseAsPairs())
      case "filter" | "where" => Pipe.Where(parseOr("_msg"))
      case "limit" | "head" =>
        // N is optional; bare `| head` defaults to 10 (pipe_limit.go:107)
        skipWs()
        if (peekCh == '|' || peekCh == ')' || peekCh == '\u0000') Pipe.Limit(10L)
        else Pipe.Limit(readLong())
      case "offset" | "skip" => Pipe.Offset(readLong())
      case "sample" => Pipe.Sample(readLong())
      case "sort" | "order" => parseSortPipe(descDefault = false)
      case "first" => parseFirstLast(desc = false)
      case "last" => parseFirstLast(desc = true)
      case "stats" => parseStatsPipe()
      case "top" => parseTopPipe()
      case "uniq" => parseUniqPipe()
      case "field_names" =>
        val out = if (consumeKeyword("as")) readToken() else "name"
        Pipe.FieldNames(out)
      case "field_values" =>
        val f = readToken()
        val lim = if (consumeKeyword("limit")) Some(readLong()) else None
        Pipe.FieldValues(f, lim)
      case "math" | "eval" => parseMathPipe()
      case "format" => parseFormatPipe()
      case "extract" => parseExtractPipe()
      case "extract_regexp" =>
        val iff = parseOptIf()
        val re = readToken()
        val from = if (consumeKeyword("from")) readToken() else "_msg"
        // pipe_extract_regexp.go:298-307 trailing options
        var keep = false; var skipE = false
        var more = true
        while (more) {
          if (consumeKeyword("keep_original_fields")) keep = true
          else if (consumeKeyword("skip_empty_results")) skipE = true
          else more = false
        }
        Pipe.ExtractRegexp(re, from, keep, skipE, iff)
      case "replace" =>
        // `replace [if (...)] (old, new) [at field] [limit N]`
        // (pipe_replace.go:82-96)
        val iff = parseOptIf()
        val (a, b) = parsePairArgs()
        val at = if (consumeKeyword("at")) readToken() else "_msg"
        val lim = if (consumeKeyword("limit")) readLong() else 0L
        Pipe.Replace(a, b, at, lim, iff)
      case "replace_regexp" =>
        val iff = parseOptIf()
        val (a, b) = parsePairArgs()
        val at = if (consumeKeyword("at")) readToken() else "_msg"
        val lim = if (consumeKeyword("limit")) readLong() else 0L
        Pipe.ReplaceRegexp(a, b, at, lim, iff)
      case "len" => parseFieldFnPipe(Pipe.Len, "len")
      case "hash" => parseFieldFnPipe(Pipe.Hash, "hash")
      case "json_array_len" => parseFieldFnPipe(Pipe.JsonArrayLen, "json_array_len")
      case "unpack_json" =>
        val iff = parseOptIf()
        val from = if (consumeKeyword("from")) readToken() else "_msg"
        val fl = if (peekKeyword("fields")) { pos += 6; parseFieldList(parens = true) } else Nil
        var p = ""; var keep = false; var skipE = false
        var more = true
        while (more) {
          if (consumeKeyword("result_prefix")) p = readToken()
          else if (consumeKeyword("keep_original_fields")) keep = true
          else if (consumeKeyword("skip_empty_results")) skipE = true
          else more = false
        }
        Pipe.UnpackJson(from, fl, p, keep, skipE, iff)
      case "unpack_logfmt" =>
        val iff = parseOptIf()
        val from = if (consumeKeyword("from")) readToken() else "_msg"
        val fl = if (peekKeyword("fields")) { pos += 6; parseFieldList(parens = true) } else Nil
        var p = ""; var keep = false; var skipE = false
        var more = true
        while (more) {
          if (consumeKeyword("result_prefix")) p = readToken()
          else if (consumeKeyword("keep_original_fields")) keep = true
          else if (consumeKeyword("skip_empty_results")) skipE = true
          else more = false
        }
        Pipe.UnpackLogfmt(from, fl, p, keep, skipE, iff)
      case "unpack_syslog" =>
        val iff = parseOptIf()
        val from = if (consumeKeyword("from")) readToken() else "_msg"
        // `offset <duration>` interprets zone-less RFC3164 timestamps in a
        // fixed zone (pipe_unpack_syslog.go:140-156)
        val off = if (consumeKeyword("offset")) {
          val tok = readToken()
          NumLit.durationNanos(tok)
            .getOrElse(throw ParseException(s"cannot parse offset '$tok'", pos))
        } else 0L
        var p = ""; var keep = false
        var more = true
        while (more) {
          if (consumeKeyword("result_prefix")) p = readToken()
          else if (consumeKeyword("keep_original_fields")) keep = true
          else more = false
        }
        Pipe.UnpackSyslog(from, p, off, keep, iff)
      case "unpack_words" =>
        // optional source: `from f`, bare `f`, or absent (_msg) —
        // pipe_unpack_words.go:139-148 treats `from` itself as optional
        skipWs()
        val from =
          if (consumeKeyword("from")) readToken()
          else if (peekCh != '|' && peekCh != ')' && peekCh != '\u0000' &&
                   !peekKeyword("as") && !peekKeyword("limit") &&
                   !peekKeyword("drop_duplicates")) readToken()
          else "_msg"
        val out = if (consumeKeyword("as")) readToken() else from
        val lim = if (consumeKeyword("limit")) readLong() else 0L
        // pipe_unpack_words.go:163-166; `limit` is this engine's extension
        val dd = consumeKeyword("drop_duplicates")
        Pipe.UnpackWords(from, out, lim, dd)
      case "unroll" =>
        val iff = parseOptIf()
        consumeKeyword("by")
        Pipe.Unroll(parseFieldList(parens = true), iff)
      case "blocks_count" =>
        val out = if (consumeKeyword("as")) readToken() else "blocks_count"
        Pipe.BlocksCount(out)
      case "block_stats" => Pipe.BlockStats
      case "pack_json" =>
        val (out, fl) = parsePackArgs()
        Pipe.PackJson(out, fl)
      case "pack_logfmt" =>
        val (out, fl) = parsePackArgs()
        Pipe.PackLogfmt(out, fl)
      case "drop_empty_fields" => Pipe.DropEmptyFields
      case "decolorize" =>
        skipWs()
        val f = if (peekCh != '|' && peekCh != ')' && peekCh != '\u0000') readToken() else "_msg"
        Pipe.Decolorize(f)
      case "collapse_nums" =>
        // `collapse_nums [if (...)] [at field] [prettify]`
        // (pipe_collapse_nums.go:83-113)
        val iff = parseOptIf()
        val at = if (consumeKeyword("at")) readToken() else "_msg"
        val pretty = consumeKeyword("prettify")
        Pipe.CollapseNums(at, pretty, iff)
      case "join" =>
        consumeKeyword("by")
        val by = parseFieldList(parens = true)
        expect('(')
        val sub = parseQuery()
        expect(')')
        val inner = consumeKeyword("inner")
        val prefix = if (consumeKeyword("prefix")) Some(readToken()) else None
        Pipe.Join(by, sub, inner, prefix)
      case "union" =>
        expect('(')
        val sub = parseQuery()
        expect(')')
        Pipe.Union(sub)
      case "stream_context" =>
        var before = 0L
        var after = 0L
        var tw = 3600L * 1000000000L // pipeStreamContextDefaultTimeWindow (1h)
        var more = true
        while (more) {
          if (consumeKeyword("before")) before = readLong()
          else if (consumeKeyword("after")) after = readLong()
          else if (consumeKeyword("time_window")) {
            val w = readToken()
            tw = NumLit.durationNanos(w)
              .getOrElse(err(s"bad time_window '$w'"))
          }
          else more = false
        }
        Pipe.StreamContext(before.toInt, after.toInt, tw)
      case "facets" =>
        skipWs()
        val n = if (peekCh.isDigit) readLong() else 10L
        var maxPerField = n
        var maxLen = 128L
        var keepConst = false
        var more = true
        while (more) {
          if (consumeKeyword("max_values_per_field")) maxPerField = readLong()
          else if (consumeKeyword("max_value_len")) maxLen = readLong()
          else if (consumeKeyword("keep_const_fields")) keepConst = true
          else more = false
        }
        Pipe.Facets(n, maxPerField, maxLen, keepConst)
      case other => barePipe(pipeStart, s"'$other'")
    }
  }

  /** Reference pipe.go:368-380 default branch: an unrecognized pipe head
    * is retried as a stats pipe without the `stats` keyword (`| count()`,
    * `| by (x) avg(y)`), then as a filter pipe without the `filter`
    * keyword (`| level:error`, `| error slow`). parseStatsFunc rejects
    * unknown function names, so a bare word never mis-parses as stats;
    * only input that fails BOTH grammars reports `unknown pipe`. */
  private def barePipe(start: Int, shown: String): Pipe = {
    def attempt(f: => Pipe): Option[Pipe] = {
      pos = start
      try Some(f)
      catch { case _: ParseException | _: NumberFormatException => None }
    }
    attempt(parseStatsPipe())
      .orElse(attempt(Pipe.Where(parseOr("_msg"))))
      .getOrElse { pos = start; err(s"unknown pipe $shown") }
  }

  private def readLong(): Long = {
    val w = readToken()
    parseNumberLiteral(w).toLong
  }

  private def parseFieldList(parens: Boolean = false): Seq[String] = {
    skipWs()
    val hasParen = peekCh == '('
    if (hasParen) pos += 1
    val fs = ArrayBuffer.empty[String]
    skipWs()
    if (!(hasParen && peekCh == ')')) {
      fs += readToken()
      while (consume(',')) fs += readToken()
    }
    if (hasParen) expect(')')
    fs.toSeq
  }

  private def parseAsPairs(): Seq[(String, String)] = {
    val ps = ArrayBuffer.empty[(String, String)]
    var more = true
    while (more) {
      val a = readToken()
      if (!consumeKeyword("as")) err("expected 'as'")
      val b = readToken()
      ps += ((a, b))
      more = consume(',')
    }
    ps.toSeq
  }

  private def parsePairArgs(): (String, String) = {
    expect('(')
    val a = readToken()
    expect(',')
    val b = readToken()
    expect(')')
    (a, b)
  }

  /** `pack_json [fields (...)] [as out]` — the reference accepts the
    * clauses in either order (docs use `pack_json fields (a, b) as c`). */
  private def parsePackArgs(): (String, Seq[String]) = {
    var out = "_msg"
    var fl: Seq[String] = Nil
    var more = true
    while (more) {
      if (consumeKeyword("as")) out = readToken()
      else if (peekKeyword("fields")) { pos += 6; fl = parseFieldList(parens = true) }
      else more = false
    }
    (out, fl)
  }

  private def parseFieldFnPipe(mk: (String, String) => Pipe, dflt: String): Pipe = {
    // parens around the source field are optional
    // (parseFieldNameWithOptionalParens), as is the `as` before the
    // result name (pipe_json_array_len.go:172-183)
    skipWs()
    val hasParen = peekCh == '('
    if (hasParen) pos += 1
    val f = readToken()
    if (hasParen) expect(')')
    skipWs()
    val out =
      if (consumeKeyword("as")) readToken()
      else if (peekCh != '|' && peekCh != ')' && peekCh != '\u0000') readToken()
      else dflt
    mk(f, out)
  }

  private def parseSortPipe(descDefault: Boolean): Pipe = {
    consumeKeyword("by")
    val keys = parseSortKeys()
    var desc = false
    var limit: Option[Long] = None
    var offset = 0L
    var rank: Option[String] = None
    var partitionBy: Seq[String] = Nil
    var more = true
    while (more) {
      if (consumeKeyword("desc")) desc = true
      else if (consumeKeyword("asc")) ()
      else if (consumeKeyword("limit")) limit = Some(readLong())
      else if (consumeKeyword("offset")) offset = readLong()
      else if (consumeKeyword("rank")) {
        rank = Some(if (consumeKeyword("as")) readToken() else "rank")
      }
      else if (consumeKeyword("partition")) {
        consumeKeyword("by")
        partitionBy = parseFieldList(parens = true)
      }
      else more = false
    }
    val keys2 = if (desc) keys.map(k => k.copy(desc = !k.desc)) else keys
    Pipe.Sort(keys2, limit, offset, rank, partitionBy)
  }

  private def parseSortKeys(): Seq[SortKey] = {
    skipWs()
    if (peekCh != '(') return Nil
    pos += 1
    val ks = ArrayBuffer.empty[SortKey]
    skipWs()
    if (peekCh != ')') {
      var more = true
      while (more) {
        val f = readToken()
        val d = if (consumeKeyword("desc")) true
                else { consumeKeyword("asc"); false }
        ks += SortKey(f, d)
        more = consume(',')
      }
    }
    expect(')')
    ks.toSeq
  }

  private def parseFirstLast(desc: Boolean): Pipe = {
    skipWs()
    val n = if (peekCh.isDigit) readLong() else 1L
    consumeKeyword("by")
    val keys0 = parseSortKeys()
    val keys = if (desc) keys0.map(k => k.copy(desc = !k.desc)) else keys0
    var rank: Option[String] = None
    var partitionBy: Seq[String] = Nil
    var more = true
    while (more) {
      if (consumeKeyword("rank")) rank = Some(if (consumeKeyword("as")) readToken() else "rank")
      else if (consumeKeyword("partition")) { consumeKeyword("by"); partitionBy = parseFieldList(parens = true) }
      else more = false
    }
    Pipe.Sort(keys, Some(n), 0L, rank, partitionBy)
  }

  private def parseStatsPipe(): Pipe = {
    // `by` is optional before the field list (pipe_stats.go:1266-1269:
    // `stats (host, path) count()` is legal)
    skipWs()
    val by =
      if (consumeKeyword("by")) parseByFields()
      else if (peekCh == '(') parseByFields()
      else Nil
    val funcs = ArrayBuffer.empty[StatsFuncAs]
    var more = true
    while (more) {
      funcs += parseStatsFunc()
      more = consume(',')
    }
    Pipe.Stats(by, funcs.toSeq)
  }

  private def parseByFields(): Seq[ByField] = {
    expect('(')
    val bs = ArrayBuffer.empty[ByField]
    skipWs()
    if (peekCh != ')') {
      var more = true
      while (more) {
        val name = readToken()
        var bucket: Option[String] = None
        var offset: Option[String] = None
        if (consume(':')) bucket = Some(readToken())
        if (consumeKeyword("offset")) offset = Some(readToken())
        bs += ByField(name, bucket, offset)
        more = consume(',')
      }
    }
    expect(')')
    bs.toSeq
  }

  private def parseStatsFunc(): StatsFuncAs = {
    val name = readWord().toLowerCase
    expect('(')
    // args: possibly empty; quantile has a leading number
    val args = ArrayBuffer.empty[String]
    skipWs()
    if (peekCh != ')') {
      args += readToken()
      while (consume(',')) args += readToken()
    }
    expect(')')
    var limit: Option[Long] = None
    if (consumeKeyword("limit")) limit = Some(readLong())
    import StatsFunc._
    // `.head` on an empty arg list must be a parse error, not a
    // NoSuchElementException 500 — and the aggregates that need a source
    // field fail the same way when called with none
    def arg0(fname: String): String = {
      if (args.isEmpty) err(s"$fname expects at least 1 argument")
      args.head
    }
    val fn: StatsFunc = name match {
      case "count" => Count(args.toSeq.filter(_ != "*"))
      case "count_empty" => CountEmpty(args.toSeq)
      case "count_uniq" => { arg0("count_uniq"); CountUniq(args.toSeq, limit) }
      case "count_uniq_hash" => { arg0("count_uniq_hash"); CountUniqHash(args.toSeq) }
      case "sum" => { arg0("sum"); Sum(args.toSeq) }
      case "avg" => { arg0("avg"); Avg(args.toSeq) }
      case "min" => { arg0("min"); Min(args.toSeq) }
      case "max" => { arg0("max"); Max(args.toSeq) }
      case "median" => Median(Seq(arg0("median")) ++ args.tail)
      case "quantile" => Quantile(parseNumberLiteral(arg0("quantile")), args.tail.toSeq)
      case "sum_len" => { arg0("sum_len"); SumLen(args.toSeq) }
      case "values" => { arg0("values"); Values(args.toSeq, limit) }
      case "uniq_values" => { arg0("uniq_values"); UniqValues(args.toSeq, limit) }
      case "json_values" =>
        // empty args = every field (parseStatsFuncFieldFilters maps an
        // empty filter list to ["*"])
        JsonValues(if (args.isEmpty) Seq("*") else args.toSeq, limit)
      case "row_any" => RowAny(args.toSeq.filter(_ != "*"))
      case "row_max" => RowMax(arg0("row_max"), args.tail.toSeq.filter(_ != "*"))
      case "row_min" => RowMin(arg0("row_min"), args.tail.toSeq.filter(_ != "*"))
      case "rate" => Rate()
      case "rate_sum" => { arg0("rate_sum"); RateSum(args.toSeq) }
      case "histogram" => Histogram(arg0("histogram"))
      case other => err(s"unknown stats function '$other'")
    }
    // optional `if (filter)`
    val iff = if (consumeKeyword("if")) {
      expect('(')
      val f = parseOr("_msg")
      expect(')')
      Some(f)
    } else None
    // optional alias: `as name` or bare name
    skipWs()
    val as =
      if (consumeKeyword("as")) readToken()
      else if (peekCh != '\u0000' && peekCh != '|' && peekCh != ',' && peekCh != ')' &&
               !peekKeyword("if")) readToken()
      else defaultStatsName(name, args.toSeq)
    StatsFuncAs(fn, as, iff)
  }

  private def defaultStatsName(name: String, args: Seq[String]): String =
    s"$name(${args.mkString(", ")})"

  private def parseTopPipe(): Pipe = {
    skipWs()
    val n = if (peekCh.isDigit) readLong() else 10L
    consumeKeyword("by")
    val fields = parseFieldList(parens = true)
    var hitsAs = "hits"
    var rankAs: Option[String] = None
    var more = true
    while (more) {
      // `hits` and `rank` both take an optional `as <name>` (pipe_top.go:
      // 634-671); bare forms keep the default output names
      if (consumeKeyword("hits")) {
        if (consumeKeyword("as")) hitsAs = readToken()
      }
      else if (consumeKeyword("rank")) {
        rankAs = Some(if (consumeKeyword("as")) readToken() else "rank")
      }
      else more = false
    }
    Pipe.Top(n, fields, hitsAs, rankAs)
  }

  private def parseUniqPipe(): Pipe = {
    consumeKeyword("by")
    val fields = parseFieldList(parens = true)
    var withHits = false
    var limit: Option[Long] = None
    var more = true
    while (more) {
      // `with hits` and bare `hits` are both accepted (pipe_uniq.go:540
      // treats `with` as optional noise before `hits` — but `with` alone
      // is a syntax error, not an implied hits)
      if (consumeKeyword("with")) {
        if (!consumeKeyword("hits")) err("expected 'hits' after 'with'")
        withHits = true
      }
      else if (consumeKeyword("hits")) withHits = true
      else if (consumeKeyword("limit")) limit = Some(readLong())
      else more = false
    }
    Pipe.Uniq(fields, withHits, limit)
  }

  // ------------------------------------------------------------- math pipe

  private def parseMathPipe(): Pipe = {
    val exprs = ArrayBuffer.empty[(MathExpr, String)]
    var more = true
    while (more) {
      val e = parseMathExpr(0)
      // the result name may be `as name`, a bare name, or ABSENT — then
      // the field is named by the expression's own rendering
      // (parseMathEntry, pipe_math.go:466-485: `| math errors / logs`
      // yields a field literally called "errors / logs")
      skipWs()
      val out =
        if (consumeKeyword("as")) readToken()
        else if (peekCh != '|' && peekCh != ')' && peekCh != ',' &&
                 peekCh != '\u0000') readToken()
        else MathExpr.render(e)
      exprs += ((e, out))
      more = consume(',')
    }
    Pipe.Math(exprs.toSeq)
  }

  /** Pratt parser; precedence per pipe_math.go:152-191. */
  private val mathPrec = Map(
    "default" -> 1, "|" -> 2, "xor" -> 2, "&" -> 3,
    "+" -> 4, "-" -> 4, "*" -> 5, "/" -> 5, "%" -> 5, "^" -> 6)

  private def peekMathOp(): Option[String] = {
    skipWs()
    peekCh match {
      case '+' | '-' | '*' | '/' | '%' | '^' | '&' | '|' =>
        // `|` ends the pipe unless doubled context — math uses `|` for bitwise
        // OR only inside parens in practice; to stay unambiguous we treat a
        // bare `|` as pipe separator and require `or` is not used. Bitwise OR
        // is rare; skip it (xor/default keywords still work).
        if (peekCh == '|') None else Some(peekCh.toString)
      case _ =>
        if (peekKeyword("default")) Some("default")
        else if (peekKeyword("xor")) Some("xor")
        else None
    }
  }

  private def parseMathExpr(minPrec: Int): MathExpr = {
    var lhs = parseMathAtom()
    var done = false
    while (!done) {
      peekMathOp() match {
        case Some(op) if mathPrec(op) >= minPrec =>
          if (op.length == 1) { skipWs(); pos += 1 } else { skipWs(); pos += op.length }
          val rhs = parseMathExpr(mathPrec(op) + 1)
          lhs = MathExpr.Bin(op, lhs, rhs)
        case _ => done = true
      }
    }
    lhs
  }

  /** Math words must additionally stop at operator chars (`a*2`, `a-b`),
    * with an exception for exponents (`1e-3`). */
  private def readMathWord(): String = {
    skipWs()
    val start = pos
    def stop(c: Char) = isWordEnd(c) || "+-*/%^&*".indexOf(c) >= 0
    while (pos < input.length && (!stop(input(pos)) ||
           ((input(pos) == '-' || input(pos) == '+') && pos > start &&
            (input(pos - 1) == 'e' || input(pos - 1) == 'E') &&
            input(start).isDigit))) pos += 1
    if (pos == start) err(s"expected math operand, got '${peekCh}'")
    input.substring(start, pos)
  }

  private def parseMathAtom(): MathExpr = {
    skipWs()
    peekCh match {
      case '(' =>
        pos += 1
        val e = parseMathExpr(0)
        expect(')')
        e
      case '-' =>
        pos += 1
        MathExpr.Neg(parseMathAtom())
      case c if isQuote(c) => MathExpr.FieldRef(readQuoted())
      case c if c.isDigit || c == '.' =>
        MathExpr.Num(parseNumberLiteral(readMathWord()))
      case _ =>
        val w = readMathWord()
        skipWs()
        if (peekCh == '(') {
          expect('(')
          val args = ArrayBuffer.empty[MathExpr]
          skipWs()
          if (peekCh != ')') {
            args += parseMathExpr(0)
            while (consume(',')) args += parseMathExpr(0)
          }
          expect(')')
          MathExpr.Call(w.toLowerCase, args.toSeq)
        } else MathExpr.FieldRef(w)
    }
  }

  // ----------------------------------------------------------- format pipe

  private def parseFormatPipe(): Pipe = {
    val iff = parseOptIf()
    val tpl = readToken()
    val out = if (consumeKeyword("as")) readToken() else "_msg"
    // pipe_format.go:297-306: one optional trailing option (we accept
    // both, a superset of the reference's single-switch grammar)
    var keep = false; var skipE = false
    var more = true
    while (more) {
      if (consumeKeyword("keep_original_fields")) keep = true
      else if (consumeKeyword("skip_empty_results")) skipE = true
      else more = false
    }
    Pipe.Format(Parser.parseFormatTemplate(tpl), out, keep, skipE, iff)
  }

  private def parseExtractPipe(): Pipe = {
    val iff = parseOptIf()
    val pat = readToken()
    val from = if (consumeKeyword("from")) readToken() else "_msg"
    var keepOrig = false
    var skipEmpty = false
    var more = true
    while (more) {
      if (consumeKeyword("keep_original_fields")) keepOrig = true
      else if (consumeKeyword("skip_empty_results")) skipEmpty = true
      else more = false
    }
    Pipe.Extract(Parser.parsePatternSteps(pat), from, keepOrig, skipEmpty, iff)
  }
}

object Parser {
  def parse(q: String, nowNs: Long = System.currentTimeMillis() * 1000000L): Query =
    new Parser(q, nowNs).parseQueryFull().copy(evalNs = nowNs)

  /** Function-style filter names (parse dispatch parser.go:1425-1568). */
  val filterFuncs: Set[String] = Set(
    "in", "contains_all", "contains_any", "seq", "re", "i", "range",
    "ipv4_range", "string_range", "len_range", "eq_field", "le_field",
    "lt_field", "value_type")

  /** Literal `<`/`>`/`&` in format/extract templates are html-escaped
    * (LogsQL.md:1849-1854: `&lt;` matches a literal `<`). Returns the
    * decoded char + consumed length, or None. */
  private def htmlEntityAt(s: String, i: Int): Option[(Char, Int)] =
    if (s.startsWith("&lt;", i)) Some(('<', 4))
    else if (s.startsWith("&gt;", i)) Some(('>', 4))
    else if (s.startsWith("&amp;", i)) Some(('&', 5))
    else None

  /** `"text<fld>text<uc:fld2>"` → Left(literal) / Right((transform, field)). */
  def parseFormatTemplate(tpl: String): Seq[Either[String, (String, String)]] = {
    val parts = ArrayBuffer.empty[Either[String, (String, String)]]
    var i = 0
    val lit = new StringBuilder
    while (i < tpl.length) {
      val c = tpl(i)
      htmlEntityAt(tpl, i) match {
        case Some((ch, n)) => lit += ch; i += n
        case None =>
      if (c == '<') {
        val end = tpl.indexOf('>', i)
        if (end < 0) { lit += c; i += 1 }
        else {
          if (lit.nonEmpty) { parts += Left(lit.result()); lit.clear() }
          val inner = tpl.substring(i + 1, end)
          val (tr, fld) = inner.indexOf(':') match {
            case -1 => ("", inner)
            case j =>
              val maybeTr = inner.substring(0, j)
              if (formatTransforms(maybeTr)) (maybeTr, inner.substring(j + 1))
              else ("", inner)
          }
          parts += Right((tr, fld))
          i = end + 1
        }
      } else { lit += c; i += 1 }
      }
    }
    if (lit.nonEmpty) parts += Left(lit.result())
    parts.toSeq
  }

  private val formatTransforms = Set(
    "base64decode", "base64encode", "duration", "duration_seconds",
    "hexdecode", "hexencode", "hexnumdecode", "hexnumencode",
    "ipv4", "lc", "uc", "time", "q", "urldecode", "urlencode")

  /** `extract` pattern `"prefix<f1>sep<f2>"` → steps (pattern.go). */
  def parsePatternSteps(pat: String): Seq[PatternStep] = {
    val steps = ArrayBuffer.empty[PatternStep]
    var i = 0
    val lit = new StringBuilder
    while (i < pat.length) {
      htmlEntityAt(pat, i) match {
        case Some((ch, n)) => lit += ch; i += n
        case None =>
      if (pat(i) == '<') {
        val end = pat.indexOf('>', i)
        if (end < 0) { lit += pat(i); i += 1 }
        else {
          val name = pat.substring(i + 1, end)
          steps += PatternStep(lit.result(), Some(name))
          lit.clear()
          i = end + 1
        }
      } else { lit += pat(i); i += 1 }
      }
    }
    if (lit.nonEmpty) steps += PatternStep(lit.result(), None)
    steps.toSeq
  }
}
