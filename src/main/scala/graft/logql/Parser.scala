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

  /** Go regexp.QuoteMeta: backslash-escape the RE2 specials. */
  private def goQuoteMeta(s: String): String = {
    val special = "\\.+*?()|[]{}^$"
    val sb = new StringBuilder
    s.foreach { c =>
      if (special.indexOf(c.toInt) >= 0) sb.append('\\')
      sb.append(c)
    }
    sb.toString
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

  /** Compound-token read mirroring the reference lexer's gluing
    * (getCompoundPhrase/getCompoundFuncArg/getCompoundToken,
    * parser.go:1580-1676): consecutive raw tokens with NO intervening
    * whitespace concatenate into one value, stopping only at the
    * grammar-specific stop chars. `=`, `<`, `>`, `!`, `~`, `-`, `/`,
    * `{`, `}` and embedded quotes all glue — `b<=a>z` is one phrase,
    * `custom-Time` one field name, `bar:baz` one value after `field:`. */
  private def readCompoundRaw(stops: String): String = {
    skipWs()
    val start = pos
    while (pos < input.length && !input(pos).isWhitespace &&
           stops.indexOf(input(pos)) < 0) pos += 1
    input.substring(start, pos)
  }

  /** Compound token with quoted-first-token support: `'abc'` cooked,
    * else raw gluing. Returns (value, wasQuoted). */
  private def readCompoundQ(stops: String): (String, Boolean) = {
    skipWs()
    if (isQuote(peekCh)) (readQuoted(), true)
    else {
      val w = readCompoundRaw(stops)
      if (w.isEmpty) err(s"compound token cannot start with '${peekCh}'")
      (w, false)
    }
  }

  // Stop sets per reference grammar production:
  private val StopsPhrase    = "*,()[]|:" // getCompoundPhrase, field position
  private val StopsPhraseVal = "*,()[]|"  // getCompoundPhrase, after `field:`
  private val StopsFuncArg   = "*,()|"    // getCompoundFuncArg (=value, in-args)
  private val StopsToken     = ",()[]|"   // getCompoundToken (regex, time, durations)

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
      // the `options` keyword commits unconditionally: a missing '(' or
      // malformed contents are hard errors like the reference
      // (parseQueryOptions, parser.go:1342-1400 — `options (error or
      // warn)` errors with "missing '='"; searching for the word needs
      // quotes: `"options" foo`)
      pos += "options".length
      skipWs()
      if (peekCh != '(')
        err("missing '(' after 'options' keyword; wrap 'options' into " +
          "quotes if you are searching for this word")
      pos += 1
      skipWs()
      var more = peekCh != ')'
      while (more) {
        val k = readToken()
        expect('=')
        val v = readToken() // repeated keys: last wins
        k match {
          case "concurrency" =>
            if (parseUIntValue(v).isEmpty)
              err(s"cannot parse 'concurrency=$v' as unsigned integer")
          case "ignore_global_time_filter" =>
            if (!Set("true", "false", "1", "0", "t", "f")(v.toLowerCase))
              err(s"cannot parse 'ignore_global_time_filter=$v' as boolean")
          case other => err(s"unknown query option '$other'")
        }
        opts(k) = v
        skipWs()
        if (consume(',')) { skipWs(); more = peekCh != ')' }
        else more = false
      }
      expect(')')
    }
    val effectiveOpts = inheritedOpts ++ opts.toMap
    val prevInherited = inheritedOpts
    inheritedOpts = effectiveOpts
    try {
      val f = parseFilterChecked()
      val pipes = ArrayBuffer.empty[Pipe]
      skipWs()
      while (consume('|')) { pipes += parsePipe(); skipWs() }
      Query(f, pipes.toSeq, effectiveOpts)
    } finally inheritedOpts = prevInherited
  }

  /** parseFilter (parser.go:1424-1441): the first unquoted token of a
    * query filter must not be a pipe name — `filter foo:bar`, `count()`,
    * `limit 10` as queries are rejected with a quote-it hint. */
  private def parseFilterChecked(): Filter = {
    skipWs()
    if (peekCh == '|' || peekCh == ')' || eof) err("missing query")
    // the check is against the first LEXER token (a token-rune run —
    // letters/digits/_/.), matching lex.rawToken: `count-x` still rejects
    var i = pos
    while (i < input.length && (input(i).isLetterOrDigit ||
           input(i) == '_' || input(i) == '.')) i += 1
    val w = input.substring(pos, i)
    if (w.nonEmpty && Parser.pipeNames(w.toLowerCase))
      err(s"query filter cannot start with pipe keyword '$w'; " +
        "put the first word of the filter into quotes")
    parseOr("")
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

  // `and`/`or`/`not` are operators only in OPERATOR position
  // (parseFilterOr/parseFilterAnd, parser.go:1443-1492): a leading `and`
  // is the phrase "and" (`f("and", "\"and\"")` in the reference tests),
  // while a trailing `foo and` / `foo or` is a hard error.
  private def parseOr(defaultField: String): Filter = {
    val parts = ArrayBuffer(parseAnd(defaultField))
    while (consumeKeyword("or")) {
      if (!filterTermAhead) err("missing filter after 'or'")
      parts += parseAnd(defaultField)
    }
    if (parts.size == 1) parts.head else Filter.Or(parts.toSeq)
  }

  private def parseAnd(defaultField: String): Filter = {
    val parts = ArrayBuffer(parseTerm(defaultField))
    var continue = true
    while (continue) {
      if (consumeKeyword("and")) {
        // after an explicit operator the next term parses unconditionally
        // (the word "or" is a phrase here, like the reference)
        skipWs()
        if (peekCh == '\u0000' || peekCh == '|' || peekCh == ')' || peekCh == ',')
          err("missing filter after 'and'")
        parts += parseTerm(defaultField)
      } else if (filterTermAhead) parts += parseTerm(defaultField)
      else continue = false
    }
    val kept = parts.filterNot(_ == Filter.Noop)
    val fs = if (kept.isEmpty) parts.take(1) else kept
    if (fs.size == 1) fs.head else Filter.And(fs.toSeq)
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

  /** After a quoted token read at [start, pos): if the very next char
    * continues the compound token (no whitespace, not a stop), the WHOLE
    * run reverts to its raw source text, quotes included — the reference
    * lexer glues adjacent tokens by their raw representation
    * (getCompoundPhrase: `"foo"bar` is the 8-char phrase "foo"bar). */
  private def glueQuotedRaw(start: Int, stops: String): Option[String] = {
    if (pos >= input.length || input(pos).isWhitespace ||
        input(pos) == '#' || // '#' opens a comment outside quotes
        stops.indexOf(input(pos)) >= 0) return None
    pos = start
    val sb = new StringBuilder
    while (pos < input.length && !input(pos).isWhitespace &&
           input(pos) != '#' && stops.indexOf(input(pos)) < 0) {
      if (isQuote(input(pos))) {
        val q = input(pos); sb += q; pos += 1
        while (pos < input.length && input(pos) != q) {
          if (input(pos) == '\\' && q != '`' && pos + 1 < input.length) {
            sb += input(pos); sb += input(pos + 1); pos += 2
          } else { sb += input(pos); pos += 1 }
        }
        if (pos >= input.length) err("unterminated quoted string")
        sb += q; pos += 1
      } else { sb += input(pos); pos += 1 }
    }
    Some(sb.result())
  }

  /** One filter term (parseGenericFilter, parser.go:1494-1578).
    * `field` is "" at top level (field-name detection allowed) and the
    * inherited field inside `field:(...)` groups, where colons glue into
    * phrases instead (`foo:(_msg:a)` is foo:"_msg:a" in the reference).
    */
  private def parseTerm0(field: String): Filter = {
    skipWs()
    peekCh match {
      case ':' => pos += 1; parseTerm(field) // empty/inherited field name
      case '!' =>
        if (pos + 1 < input.length && input(pos + 1) == '=') {
          pos += 2; negate(parseExactRhs(fld(field)))
        } else if (pos + 1 < input.length && input(pos + 1) == '~') {
          pos += 2; negate(regexpFilter(fld(field)))
        } else { pos += 1; negate(parseTerm(field)) }
      case '-' => pos += 1; negate(parseTerm(field)) // `-foo` ≡ !foo
      case '(' =>
        pos += 1
        val f = parseOr(field)
        expect(')')
        f
      case '{' =>
        if (field.nonEmpty && field != "_stream")
          err(s"stream filter cannot be applied to '$field' field")
        parseStreamFilter()
      case '*' =>
        pos += 1
        skipWs()
        if (peekCh == ':') err("cannot search for wildcard field name")
        if (field.isEmpty) Filter.Noop else Filter.Prefix(field, "")
      case '=' =>
        pos += 1
        parseExactRhs(fld(field))
      case '>' | '<' => parseCompareRhs(fld(field))
      case '~' =>
        pos += 1
        regexpFilter(fld(field))
      case c if isQuote(c) =>
        val qStart = pos
        val s = readQuoted()
        glueQuotedRaw(qStart,
            if (field.isEmpty) StopsPhrase else StopsPhraseVal) match {
          case Some(glued) => Filter.Phrase(fld(field), glued)
          case None =>
        if (peekCh == '*') { // adjacent `'foo'*` → prefix (no space allowed)
          pos += 1
          skipWs()
          if (peekCh == ':') err(s"field name prefix filter '$s*' isn't supported")
          Filter.Prefix(fld(field), s)
        } else {
          skipWs()
          if (field.isEmpty && peekCh == ':') { pos += 1; dispatchField(s) }
          else Filter.Phrase(fld(field), s)
        }
        }
      case _ =>
        if (consumeKeyword("not")) return negate(parseTerm(field))
        val stops = if (field.isEmpty) StopsPhrase else StopsPhraseVal
        val w = readCompoundRaw(stops)
        if (w.isEmpty) err(s"unexpected token '${peekCh}'")
        wordTail(field, w)
    }
  }

  /** Continuation after an unquoted compound word at filter position:
    * function call, prefix `w*`, `field:` detection, or plain phrase.
    * Unknown name + ADJACENT '(' is the reference's "missing whitespace
    * after the search word" error (parseGenericFilter, parser.go:1518);
    * with a space between, the paren opens a new AND group instead. */
  private def wordTail(field: String, w: String): Filter = {
    val adjParen = pos < input.length && input(pos) == '('
    val adjStar  = pos < input.length && input(pos) == '*'
    skipWs()
    if ((peekCh == '(' || (peekCh == '[' && w.equalsIgnoreCase("range"))) &&
        Parser.filterFuncs(w.toLowerCase))
      return parseFuncFilter(fld(field), w.toLowerCase)
    if (adjParen)
      err(s"missing whitespace after the search word '$w'")
    if (adjStar) {
      pos += 1
      skipWs()
      if (peekCh == ':') err(s"field name prefix filter '$w*' isn't supported")
      return Filter.Prefix(fld(field), w)
    }
    if (field.isEmpty && peekCh == ':') { pos += 1; return dispatchField(w) }
    Filter.Phrase(fld(field), w)
  }

  /** `name:` seen at top level — special names get their own grammar
    * (parseFilterForPhrase, parser.go:1710-1724). */
  private def dispatchField(name: String): Filter = name match {
    case "_time" => parseTimeFilter()
    case "_stream_id" => parseStreamIdFilter()
    case "_stream" => { skipWs(); parseStreamFilter() }
    case f => parseFilterRhs(f)
  }

  private def fld(f: String): String = if (f.isEmpty) "_msg" else f

  /** After `field:` — dispatch on the right-hand side (parseGenericFilter
    * with a non-empty fieldName: colons glue into the value). */
  private def parseFilterRhs(field: String): Filter = {
    skipWs()
    peekCh match {
      case ':' => pos += 1; parseFilterRhs(field)
      case '!' =>
        if (pos + 1 < input.length && input(pos + 1) == '=') {
          pos += 2; negate(parseExactRhs(field))
        } else if (pos + 1 < input.length && input(pos + 1) == '~') {
          pos += 2; negate(regexpFilter(field))
        } else { pos += 1; negate(parseFilterRhs(field)) }
      case '-' => pos += 1; negate(parseFilterRhs(field))
      case '=' => pos += 1; parseExactRhs(field)
      case '~' => pos += 1; regexpFilter(field)
      case '>' | '<' => parseCompareRhs(field)
      case '(' => pos += 1; val f = parseOr(field); expect(')'); f
      case '{' => err(s"stream filter cannot be applied to '$field' field")
      case '*' =>
        pos += 1
        Filter.Prefix(field, "")
      case c if isQuote(c) =>
        val qStart = pos
        val s = readQuoted()
        glueQuotedRaw(qStart, StopsPhraseVal) match {
          case Some(glued) => Filter.Phrase(field, glued)
          case None =>
            if (peekCh == '*') { pos += 1; Filter.Prefix(field, s) }
            else Filter.Phrase(field, s)
        }
      case '\u0000' => err(s"missing filter after field name '$field'")
      case _ =>
        if (consumeKeyword("not")) return negate(parseFilterRhs(field))
        val w = readCompoundRaw(StopsPhraseVal)
        if (w.isEmpty) err(s"missing filter after field name '$field'")
        wordTail(field, w)
    }
  }

  /** `:=value` / `=value` / `!=value` — exact filter; the value is a
    * compound func arg (getCompoundFuncArg: `=`, `<`, `>`, `:` glue, so
    * `=foo=bar` is exact-match "foo=bar"), `*` adjacent → exact-prefix. */
  private def parseExactRhs(field: String): Filter = {
    skipWs()
    if (isQuote(peekCh)) {
      val v = readQuoted()
      if (peekCh == '*') { pos += 1; Filter.ExactPrefix(field, v) }
      else Filter.Exact(field, v)
    } else {
      val v = readCompoundRaw(StopsFuncArg)
      if (v.isEmpty) err("missing exact-filter value")
      if (peekCh == '*') { pos += 1; Filter.ExactPrefix(field, v) }
      else Filter.Exact(field, v)
    }
  }

  /** `~regex` / `re(...)` — the pattern must compile (newFilterRegexp
    * calls regexp.Compile at parse time; `~*` and re(`ab(`) are parse
    * errors, not runtime 500s). */
  /** Build a NOT filter, collapsing double negation like the reference
    * (`not !x` parses to x — TestParseQuery canonical pins). */
  private def negate(f: Filter): Filter = f match {
    case Filter.Not(inner) => inner
    case other => Filter.Not(other)
  }

  private def regexpFilter(field: String): Filter = {
    skipWs()
    val re = if (isQuote(peekCh)) readQuoted() else {
      val v = readCompoundRaw(StopsToken)
      if (v.isEmpty) err("missing regexp")
      v
    }
    validateRegexp(re)
    // Grafana-style trivial regexps optimize at parse time
    // (newFilterRegexp, parser.go:2041-2050): ""/".*" match everything,
    // ".+" is the any-non-empty-value prefix filter
    if (re == "" || re == ".*") Filter.Noop
    else if (re == ".+") Filter.Prefix(fld(field), "")
    else Filter.Regexp(field, re)
  }

  private def validateRegexp(re: String): Unit = {
    // same Go→Java translation the compile layer applies to rlike patterns
    val javaRe = re.replace("(?P<", "(?<")
    try java.util.regex.Pattern.compile(javaRe)
    catch {
      case e: java.util.regex.PatternSyntaxException =>
        err(s"invalid regexp '$re': ${e.getDescription}")
    }
  }

  private def parseCompareRhs(field: String): Filter = {
    val op = new StringBuilder
    op += input(pos); pos += 1
    if (peekCh == '=') { op += '='; pos += 1 }
    skipWs()
    val raw = if (isQuote(peekCh)) readQuoted() else readCompoundRaw(StopsToken)
    if (raw.isEmpty)
      err("missing comparison operand") // a truncated query must not
        // degrade into a match-nearly-everything string range
    NumLit.parse(raw) match {
      case Some(n) =>
        val rp = op.result() + raw // canonical keeps the source token
        op.result() match {
        case ">"  => Filter.Range(field, n, Double.PositiveInfinity, inclLo = false, inclHi = true, rp)
        case ">=" => Filter.Range(field, n, Double.PositiveInfinity, inclLo = true, inclHi = true, rp)
        case "<"  => Filter.Range(field, Double.NegativeInfinity, n, inclLo = true, inclHi = false, rp)
        case "<=" => Filter.Range(field, Double.NegativeInfinity, n, inclLo = true, inclHi = true, rp)
        case o    => err(s"unsupported comparison '$o'")
      }
      case None =>
        // non-numeric operand: string-ordering compare, desugared to a
        // string_range like the reference (tryParseFilterGTString/LTString,
        // parser.go:2182-2217 — a trailing NUL flips bound inclusivity;
        // the "unbounded" max mirrors maxStringRangeValue's best-effort
        // sentinel, filter_string_range.go:9)
        val MaxStr = Filter.MaxStringRange
        val rp = op.result() + Canon.quoteStringToken(raw)
        op.result() match {
          case ">"  => Filter.StringRange(field, raw + "\u0000", MaxStr, rp)
          case ">=" => Filter.StringRange(field, raw, MaxStr, rp)
          case "<"  => Filter.StringRange(field, "", raw, rp)
          case "<=" => Filter.StringRange(field, "", raw + "\u0000", rp)
          case o    => err(s"unsupported comparison '$o'")
        }
    }
  }

  /** Optional `if (<filters>)` clause on a pipe (if_filter.go:55).
    * `if ()` is the empty always-true filter (the reference parses it as
    * a filterNoop — `stats count() if () rows` is valid). */
  private def parseOptIf(): Option[Filter] =
    if (consumeKeyword("if")) {
      expect('(')
      skipWs()
      if (peekCh == ')') { pos += 1; Some(Filter.Noop) }
      else {
        val f = parseOr("")
        expect(')')
        Some(f)
      }
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

  /** A value-producing subquery must END with `| fields <one field>` or
    * `| uniq by (<one field>)` (getFieldNameFromPipes, parser.go:2978-
    * 2996) — `in(x | limit 10)` and `in(x | fields a,b)` are parse
    * errors in the reference. */
  private def requireSingleFieldSubquery(sub: Query, fn: String): Query = {
    sub.pipes.lastOption match {
      case Some(Pipe.Fields(fs)) if fs.size == 1 && !fs.head.contains("*") => sub
      case Some(Pipe.Uniq(fs, _, _)) if fs.size == 1 && !fs.head.contains("*") => sub
      case _ => err(s"the '$fn(...)' subquery must end with a 'fields' or " +
        "'uniq' pipe containing a single field name")
    }
  }

  private def parseSubquery(fn: String): Query = {
    expect('(')
    val sub = parseQuery()
    expect(')')
    requireSingleFieldSubquery(sub, fn)
  }

  /** Function-style filters: in(...), seq(...), range(...), etc. */
  private def parseFuncFilter(field: String, fn: String): Filter = fn match {
    case "in" =>
      // `in(subquery)` vs `in(v1, ..., vN)`: a '|' at paren depth 1 means a
      // piped subquery (reference distinguishes the same way — a query
      // producing one result column via `| fields f`); `in(*)` is the
      // match-all noop (TestParseFilterInStar)
      if (peeksLikeSubquery()) Filter.InQuery(field, parseSubquery("in"))
      else parseArgListOrStar() match {
        case None => Filter.Noop
        case Some(args) => Filter.In(field, args)
      }
    case "contains_all" =>
      if (peeksLikeSubquery())
        Filter.ContainsQuery(field, parseSubquery("contains_all"), all = true)
      else parseArgListOrStar() match {
        case None => Filter.Noop // `contains_all(*)` matches all
        case Some(args) => Filter.ContainsAll(field, args)
      }
    case "contains_any" =>
      if (peeksLikeSubquery())
        Filter.ContainsQuery(field, parseSubquery("contains_any"), all = false)
      else parseArgListOrStar() match {
        case None => Filter.Noop
        case Some(args) => Filter.ContainsAny(field, args)
      }
    case "seq" => Filter.Sequence(field, parseArgList())
    case "re" =>
      val a = parseArgList()
      if (a.size != 1) err("re expects exactly 1 argument")
      validateRegexp(a.head)
      Filter.Regexp(field, a.head)
    case "i" =>
      expect('(')
      skipWs()
      val f =
        if (isQuote(peekCh)) {
          val v = readQuoted()
          if (peekCh == '*') { pos += 1; Filter.AnyCasePrefix(field, v) }
          else Filter.AnyCasePhrase(field, v)
        } else if (peekCh == '*') { pos += 1; Filter.AnyCasePrefix(field, "") }
        else {
          val v = readCompoundRaw(StopsFuncArg)
          if (v.isEmpty) err("missing i(...) argument")
          if (peekCh == '*') { pos += 1; Filter.AnyCasePrefix(field, v) }
          else Filter.AnyCasePhrase(field, v)
        }
      expect(')')
      f
    case "exact" =>
      // `exact(foo)` / `exact(foo*)` (parseFilterExact) — one arg only
      expect('(')
      val f = parseExactRhs(field)
      expect(')')
      f
    case "range" =>
      skipWs()
      val inclLo = peekCh == '['
      if (peekCh != '(' && peekCh != '[') err("range expects ( or [")
      val open = peekCh
      pos += 1
      val loTok = readToken()
      val lo = parseNumberLiteral(loTok)
      expect(',')
      val hiTok = readToken()
      val hi = parseNumberLiteral(hiTok)
      consume(',') // trailing comma tolerated
      skipWs()
      val inclHi = peekCh == ']'
      if (peekCh != ')' && peekCh != ']') err("range expects ) or ]")
      val close = peekCh
      pos += 1
      Filter.Range(field, lo, hi, inclLo, inclHi,
        s"range$open$loTok, $hiTok$close")
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
      Filter.StringRange(field, args(0), args(1),
        s"string_range(${args.map(Canon.quoteToken).mkString(", ")})")
    case "len_range" =>
      // lengths are unsigned integers (parseFilterLenRange uses
      // tryParseUint64 after size-suffix expansion): `len_range(1.2,
      // 3.4)` is a parse error, `len_range(1.5KB, 10KB)` is 1500..10000
      val args = parseArgList()
      if (args.size != 2) err("len_range expects 2 args")
      def lenArg(a: String): Long =
        parseUIntValue(a) // inf/+inf → MaxValue like parseUint
          .getOrElse(err(s"len_range expects non-negative integer lengths, got '$a'"))
      Filter.LenRange(field, lenArg(args(0)), lenArg(args(1)),
        s"len_range(${args.mkString(", ")})")
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

  /** Filter-function argument list: compound func args (colons, slashes,
    * dashes glue; `*` stops — `in(foo*)` and `in(foo|bar)` are parse
    * errors like the reference), trailing comma tolerated. */
  private def parseArgList(): Seq[String] = {
    expect('(')
    val args = ArrayBuffer.empty[String]
    skipWs()
    var more = peekCh != ')'
    while (more) {
      args += (if (isQuote(peekCh)) readQuoted() else {
        val v = readCompoundRaw(StopsFuncArg)
        if (v.isEmpty) err(s"unexpected token '${peekCh}' in argument list")
        v
      })
      skipWs()
      if (consume(',')) { skipWs(); more = peekCh != ')' }
      else more = false
    }
    expect(')')
    args.toSeq
  }

  /** Like parseArgList but `(*)` returns None (match-all for in()). */
  private def parseArgListOrStar(): Option[Seq[String]] = {
    skipWs()
    val save = pos
    expect('(')
    skipWs()
    if (peekCh == '*') {
      pos += 1
      skipWs()
      if (peekCh == ')') { pos += 1; return None }
    }
    pos = save
    Some(parseArgList())
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

  /** parseMathNumber (pipe_math.go:1065): number (durations are NANOS in
    * math context), RFC3339 timestamp -> unix nanos, IPv4 -> uint32,
    * anything else NaN — math never fails to parse a constant. */
  def parseMathNumber(raw: String): Double = {
    val s = raw.trim
    NumLit.sizeValue(s)
      .orElse(NumLit.durationNanos(s).filter(_ => s.exists(_.isLetter)).map(_.toDouble))
      .orElse(NumLit.parse(s).filter(_ => !s.exists(c => c.isLetter && "eExX".indexOf(c) < 0)))
      .orElse(try Some((new Parser(s, 0L)).parseTimeBound(s)._1.toDouble)
              catch { case _: Exception => None })
      .orElse(try {
        val parts = s.split("\\.")
        if (parts.length == 4 && parts.forall(p => p.nonEmpty && p.forall(_.isDigit) && p.toInt <= 255))
          Some(parts.foldLeft(0L)((acc, p) => (acc << 8) | p.toInt).toDouble)
        else None
      } catch { case _: Exception => None })
      .getOrElse(Double.NaN)
  }

  def parseNumberLiteral(raw: String): Double =
    NumLit.parse(raw).getOrElse(err(s"bad number '$raw'"))

  def durationNanos(str: String): Option[Long] = NumLit.durationNanos(str)

  // ------------------------------------------------------------ time filter

  private def parseTimeFilter(): Filter = {
    val f = parseTimeFilterInner()
    // `_time:5m offset 1h` (parser.go:2598-2608): shift the whole window
    // back by the duration; the offset may be negative/fractional
    // (`offset -1.5d` — TestParseTimeDuration:396).
    if (consumeKeyword("offset")) {
      val w = readTimeWord()
      val d = signedDuration(w)
        .getOrElse(err("bad duration after 'offset'"))
      def withOff(repr: String): String =
        if (repr.isEmpty) s"offset $w" else s"$repr offset $w"
      f match {
        case tr @ Filter.TimeRange(lo, hi, rp) =>
          // the reference subtracts from BOTH bounds with plain int64
          // WRAPPING (parser.go:2606-2607) — `<X offset 30m5s` wraps
          // MinInt64 into a huge positive min and matches nothing, and
          // the open upper bound becomes MaxInt64-offset. The bare
          // `_time:offset 1d` form shifts only the upper bound (:2580).
          val bare = rp.isEmpty
          tr.copy(
            loNs = if (bare) lo else lo - d,
            hiNs = if (hi == Long.MaxValue) Long.MaxValue - d + 1 else hi - d,
            repr = withOff(rp))
        case dr: Filter.DayRange => dr.copy(offsetNs = d, repr = withOff(dr.repr))
        case wr: Filter.WeekRange => wr.copy(offsetNs = d, repr = withOff(wr.repr))
        case other => other
      }
    } else f
  }

  /** Signed duration: `-1.5d`, `5m34s5ms` — DurationValue grammar
    * (metricsql lexer.go: leading '-' negates the whole chain). */
  private def signedDuration(w: String): Option[Long] =
    if (w.startsWith("-")) NumLit.durationNanos(w.substring(1)).map(-_)
    else NumLit.durationNanos(w)

  /** `2d` is a duration operand, `2024...`/`now` a timestamp
    * (isLikelyTimestamp, parser.go:2836: `now` or starts-with-year). */
  private def likelyTimestamp(w: String): Boolean =
    w == "now" || w.startsWith("now") ||
      (w.length >= 4 && w.take(4).forall(_.isDigit))

  private def parseTimeFilterInner(): Filter = {
    skipWs()
    // bare `_time:offset 1d` → (-inf, now] shifted (parser.go:2580-2592)
    if (peekKeyword("offset")) return Filter.TimeRange(Long.MinValue, now + 1)
    peekCh match {
      case '[' | '(' =>
        val inclLo = peekCh == '['
        pos += 1
        val loS = readTimeBoundToken(",")
        expect(',')
        val hiS = readTimeBoundToken(")]")
        skipWs()
        if (peekCh != ')' && peekCh != ']')
          err("_time filter must end with ']' or ')'")
        val inclHi = peekCh == ']'
        pos += 1
        val (lo1, _) = parseTimeBound(loS)
        val (hi1, hi2) = parseTimeBound(hiS)
        // exclusive bounds are instant±1ns; an inclusive upper bound
        // covers the full granularity of its string form
        // (parseFilterTime, parser.go:2670-2686)
        val lo = if (inclLo) lo1 else lo1 + 1
        val hi = if (inclHi) hi2 else hi1
        val ob = if (inclLo) "[" else "("
        val cb = if (inclHi) "]" else ")"
        Filter.TimeRange(lo, hi, s"$ob$loS,$hiS$cb")
      case '>' =>
        // `_time:>dur` selects entries OLDER than now-dur
        // (parseFilterTimeGt, parser.go:2697-2744); `>timestamp` is the
        // open-ended newer-than range
        pos += 1
        val incl = consume('=')
        val w = readTimeWord()
        if (!likelyTimestamp(w)) {
          val d = signedDuration(w).map(math.abs)
            .getOrElse(err(s"cannot parse duration '$w'"))
          Filter.TimeRange(Long.MinValue, if (incl) now - d + 1 else now - d,
            (if (incl) ">=" else ">") + w)
        } else {
          // `>ts` starts 1ns past the instant (parseFilterTimeGt:2715),
          // NOT past the granularity window
          val (b1, _) = parseTimeBound(w)
          Filter.TimeRange(if (incl) b1 else b1 + 1, Long.MaxValue,
            (if (incl) ">=" else ">") + w)
        }
      case '<' =>
        // `_time:<dur` selects entries NEWER than now-dur
        // (parseFilterTimeLt, parser.go:2746-2794)
        pos += 1
        val incl = consume('=')
        val w = readTimeWord()
        if (!likelyTimestamp(w)) {
          val d = signedDuration(w).map(math.abs)
            .getOrElse(err(s"cannot parse duration '$w'"))
          Filter.TimeRange(if (incl) now - d else now - d + 1, now + 1,
            (if (incl) "<=" else "<") + w)
        } else {
          val (b1, b2) = parseTimeBound(w)
          Filter.TimeRange(Long.MinValue, if (incl) b2 else b1,
            (if (incl) "<=" else "<") + w)
        }
      case _ =>
        // `=` prefix is the explicit exact form (parseFilterTimeEq):
        // `_time:=2024Z`, `_time:=2d`
        val eq = if (consume('=')) "=" else ""
        val w = readTimeWord()
        skipWs()
        if (peekCh == '(' || peekCh == '[') {
          if (w.equalsIgnoreCase("day_range")) return parseDayRange()
          if (w.equalsIgnoreCase("week_range")) return parseWeekRange()
        }
        if (!likelyTimestamp(w)) {
          signedDuration(w).map(math.abs) match {
            case Some(d) => Filter.TimeRange(now - d, now + 1, eq + w) // last-d window
            case None => err(s"cannot parse _time filter '$w'")
          }
        } else {
          val (b1, b2) = parseTimeBound(w)
          Filter.TimeRange(b1, b2, eq + w)
        }
    }
  }

  /** One time bound inside `[lo, hi]` — quoted (`"2024-01-02+02:00"`)
    * or raw up to the stop chars (getCompoundToken allows ':'/'-'). */
  private def readTimeBoundToken(stops: String): String = {
    skipWs()
    if (isQuote(peekCh)) readQuoted()
    else readUntil(stops).trim
  }

  /** Time words may contain ':' so read raw until delimiter. */
  private def readTimeWord(): String = {
    skipWs()
    if (isQuote(peekCh)) return readQuoted()
    val start = pos
    while (pos < input.length && !input(pos).isWhitespace &&
           "(){}[]|,".indexOf(input(pos)) < 0) pos += 1
    input.substring(start, pos)
  }

  /** A time bound, following timeutil.ParseTimeAt (vendor lib/timeutil/
    * time.go:39-150) exactly: returns (instant, matchingEndExclusive)
    * where instant is the parsed nanosecond timestamp and the second
    * component is getMatchingEndTime(instant, s)+1 (parser.go:2830-2860)
    * — the exclusive end of the string's calendar granularity, used by
    * inclusive upper bounds and the bare `_time:YYYY-MM-DD` form. */
  def parseTimeBound(s0: String): (Long, Long) = {
    import java.time._
    val sOrig = s0.trim
    if (sOrig.isEmpty) err("missing time bound")
    if (sOrig == "now") return (now, now + 1)
    var s = sOrig
    var tzOffsetNs = 0L
    var tzStripped = s // string with tz suffix removed, for granularity
    // Timezone suffix rule (time.go:44-70): the LAST 6 chars are a tz
    // offset iff they look like ±hh:mm — `2024-02:30` is year 2024 at
    // -02:30, `2024-01-02:30` is year 2024-01 (sic: "2024-01" len 7)…
    // actually "2024-01-02:30".dropRight(6) = "2024-01" — month at -02:30.
    if (sOrig.length > 6) {
      val tz = sOrig.takeRight(6)
      if ((tz(0) == '-' || tz(0) == '+') && tz(3) == ':' &&
          tz(1).isDigit && tz(2).isDigit && tz(4).isDigit && tz(5).isDigit) {
        tzOffsetNs = (tz.substring(1, 3).toLong * 3600 +
          tz.substring(4).toLong * 60) * 1000000000L
        if (tz(0) == '+') tzOffsetNs = -tzOffsetNs
        s = sOrig.dropRight(6)
        tzStripped = s
      } else if (!s.endsWith("Z")) {
        // no explicit tz and no Z → local timezone (container runs UTC;
        // the store is written/queried in the same zone, so offset 0)
        tzOffsetNs = 0L
      }
    }
    if (s.endsWith("Z")) { s = s.dropRight(1); tzStripped = s }
    // Relative to now (time.go:72-84): trailing non-digit, leading '-',
    // or a `now±…` prefix parse as a duration offset back from now
    if ((s.nonEmpty && (s.last > '9' || s(0) == '-')) || s.startsWith("now")) {
      val d0 = signedDuration(s.stripPrefix("now"))
        .getOrElse(err(s"bad time bound '$s0'"))
      val d = if (d0 > 0) -d0 else d0
      val t = now + d
      return (t, t + 1)
    }
    def granEndExclusive(instant: Long): Long = {
      // getMatchingEndTime+1: advance the instant by the granularity of
      // the (tz-stripped) string form, preserving any intra-day offset.
      // Year/month ends mirror the reference's time.Date(y, m+1, d=0)
      // normalization: a tz-shifted instant landing on day != 1 ends on
      // the LAST day of the next month, not a clamped plusMonths
      val dt = LocalDateTime.ofEpochSecond(
        Math.floorDiv(instant, 1000000000L),
        Math.floorMod(instant, 1000000000L).toInt, ZoneOffset.UTC)
      def back(d: LocalDateTime): Long =
        d.toEpochSecond(ZoneOffset.UTC) * 1000000000L + d.getNano
      val nsecOfDay = dt.toLocalTime.toNanoOfDay
      def goDate(y: Int, m: Int, d: Int): LocalDateTime = {
        // Go time.Date normalizes out-of-range fields: month 13 rolls
        // into the next year, day 0 is the last day of month-1
        var ld = LocalDate.of(y, 1, 1).plusMonths(m - 1L)
        ld = ld.plusDays(d - 1L)
        ld.atStartOfDay.plusNanos(nsecOfDay)
      }
      val n = tzStripped.length
      if (n == 4)
        back(goDate(dt.getYear + 1, dt.getMonthValue, dt.getDayOfMonth))
      else if (n == 7 && tzStripped(4) == '-') {
        val (m2, d2) =
          if (dt.getDayOfMonth != 1) (dt.getMonthValue + 2, 0)
          else (dt.getMonthValue + 1, 1)
        back(goDate(dt.getYear, m2, d2))
      }
      else if (n == 10 && tzStripped(4) == '-') instant + 86400L * 1000000000L
      else if (n == 13 && tzStripped(4) == '-') instant + 3600L * 1000000000L
      else if (n == 16 && tzStripped(4) == '-') instant + 60L * 1000000000L
      else if (n == 19 && tzStripped(4) == '-') instant + 1000000000L
      else if (n == 23 && tzStripped(4) == '-') instant + 1000000L
      else instant + 1L
    }
    try {
      // YYYY
      if (s.length == 4 && s.forall(_.isDigit)) {
        val y = s.toInt
        if (y < 1970 || y > 2262) err(s"year in '$s0' must be in [1970, 2262]")
        val t = LocalDateTime.of(y, 1, 1, 0, 0)
          .toEpochSecond(ZoneOffset.UTC) * 1000000000L + tzOffsetNs
        return (t, granEndExclusive(t))
      }
      // Numeric unix timestamp: seconds / millis / micros / nanos by
      // magnitude (TryParseUnixTimestamp + getUnixTimestampNanoseconds);
      // fractional forms like 1234567890.123 are seconds with a fraction
      if (!sOrig.contains("-")) {
        val t =
          if (sOrig.forall(_.isDigit)) {
            val v = sOrig.toLong
            if (v < (1L << 31)) v * 1000000000L
            else if (v < 1000L * (1L << 31)) v * 1000000L
            else if (v < 1000000L * (1L << 31)) v * 1000L
            else v
          } else if (sOrig.matches("\\d+\\.\\d+")) {
            // integer math like tryParseFractionalNumberForUnixTimestamp:
            // float multiplication would lose sub-millisecond digits
            val Array(ip, fp0) = sOrig.split("\\.", 2)
            var unit = ip.toLong
            var fp = fp0
            while (fp.length % 3 != 0) fp += "0"
            var frac = 0L
            var scale = 0
            fp.grouped(3).foreach { g => frac = frac * 1000 + g.toLong; scale += 3 }
            val base =
              if (unit < (1L << 31)) unit * 1000000000L
              else if (unit < 1000L * (1L << 31)) unit * 1000000L
              else if (unit < 1000000L * (1L << 31)) unit * 1000L
              else unit
            val mult =
              if (unit < (1L << 31)) 1000000000L
              else if (unit < 1000L * (1L << 31)) 1000000L
              else if (unit < 1000000L * (1L << 31)) 1000L
              else 1L
            base + frac * mult / math.pow(10, scale).toLong
          } else if (sOrig.matches("\\d+(\\.\\d+)?[eE]\\d+")) {
            val sec = sOrig.toDouble
            if (sec < (1L << 31)) (sec * 1e9).round
            else if (sec < 1000d * (1L << 31)) (sec * 1e6).round
            else if (sec < 1000000d * (1L << 31)) (sec * 1e3).round
            else sec.round
          } else err(s"bad time bound '$s0'")
        return (t, t + 1L)
      }
      def utcNs(dt: LocalDateTime): Long =
        dt.toEpochSecond(ZoneOffset.UTC) * 1000000000L + dt.getNano + tzOffsetNs
      val t = s.length match {
        case 7 => // YYYY-MM
          val Array(y, m) = s.split("-", 2)
          utcNs(LocalDateTime.of(y.toInt, m.toInt, 1, 0, 0))
        case 10 => // YYYY-MM-DD
          utcNs(LocalDate.parse(s).atStartOfDay())
        case 13 => // YYYY-MM-DDTHH
          utcNs(LocalDate.parse(s.take(10)).atTime(s.substring(11).toInt, 0))
        case 16 => // YYYY-MM-DDTHH:MM
          utcNs(LocalDateTime.parse(s))
        case 19 => // YYYY-MM-DDTHH:MM:SS
          utcNs(LocalDateTime.parse(s))
        case _ =>
          // full RFC3339 — requires an explicit timezone (time.go:144:
          // `2023-01-02T04:05:06.789` with no tz is a PARSE ERROR), and
          // the offset must be Z or ±hh:mm (Go rejects bare `+12`, which
          // java.time would accept)
          if (!sOrig.endsWith("Z") &&
              !sOrig.takeRight(6).matches("[+-]\\d{2}:\\d{2}"))
            err(s"bad time bound '$s0'")
          OffsetDateTime.parse(sOrig).toInstant match {
            case i => i.getEpochSecond * 1000000000L + i.getNano
          }
      }
      (t, granEndExclusive(t))
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
    if (peekCh != ']' && peekCh != ')')
      err("day_range must end with ']' or ')'")
    val inclEnd = peekCh == ']'
    pos += 1
    // hh:mm → nanoseconds within the day, clamped to the last nano like
    // the reference (getDayRangeArg: offset >= nsecsPerDay → nsecsPerDay-1);
    // exclusive braces fold into ±1ns (parseFilterDayRange)
    def nanos(s: String): Long = {
      val p = s.trim.split(":")
      def num(x: String): Int =
        x.toIntOption.getOrElse(err(s"bad day_range time '$s'"))
      val ns = num(p(0)) * 3600000000000L +
        (if (p.length > 1) num(p(1)) else 0) * 60000000000L
      if (ns >= 86400000000000L) 86400000000000L - 1 else ns
    }
    Filter.DayRange(
      nanos(a) + (if (inclStart) 0L else 1L),
      nanos(b) - (if (inclEnd) 0L else 1L),
      repr = s"${if (inclStart) "[" else "("}$a, $b${if (inclEnd) "]" else ")"}")
  }

  private def parseWeekRange(): Filter = {
    skipWs()
    val inclStart = peekCh == '['
    pos += 1
    val a = readUntil(",")
    expect(',')
    val b = readUntil(")]")
    skipWs()
    if (peekCh != ']' && peekCh != ')')
      err("week_range must end with ']' or ')'")
    val inclEnd = peekCh == ']'
    pos += 1
    def dow(s: String): Int = s.trim.toLowerCase.take(3) match {
      case "sun" => 0; case "mon" => 1; case "tue" => 2; case "wed" => 3
      case "thu" => 4; case "fri" => 5; case "sat" => 6
      case other => err(s"bad day of week '$other'")
    }
    // exclusive braces fold into ±1 day (parseFilterWeekRange)
    Filter.WeekRange(
      dow(a) + (if (inclStart) 0 else 1),
      dow(b) - (if (inclEnd) 0 else 1),
      repr = s"${if (inclStart) "[" else "("}$a, $b${if (inclEnd) "]" else ")"}")
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
        Filter.InQuery("_stream_id",
          requireSingleFieldSubquery(sub, "_stream_id:in"))
      } else parseArgListOrStar() match {
        case None => Filter.Noop // `_stream_id:in(*)` matches all
        case Some(ids) => Filter.StreamId(ids.map(checkStreamId))
      }
    } else Filter.StreamId(Seq(checkStreamId(readToken())))
  }

  /** Stream ids are hex strings (the reference unmarshals a 128-bit
    * (u128) id, filter_stream_id.go; this store uses 64-bit xxhash ids —
    * both shapes are hex, anything else is a parse error, not an
    * always-false filter). */
  private def checkStreamId(s: String): String = {
    if (s.isEmpty || !s.forall(c => Character.digit(c, 16) >= 0))
      err(s"cannot parse _stream_id '$s': must be a hex string")
    s
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
        // `label in (v1, v2)` / `label not_in (...)` desugar AT PARSE to
        // anchored regex matchers like the reference (stream_filter.go:
        // 185-203: QuoteMeta-escaped args joined with '|'; a lone `*`
        // becomes `.*`); `=`/`!=`/`=~`/`!~` pass through
        val op0 =
          if (peekKeyword("not_in")) { pos += "not_in".length; "not_in" }
          else if (peekKeyword("in")) { pos += 2; "in" }
          else peekCh match {
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
        if (op0 == "in" || op0 == "not_in") {
          skipWs()
          expect('(')
          val args = ArrayBuffer.empty[String]
          var more = true
          while (more) {
            skipWs()
            if (peekCh == ')') { pos += 1; more = false }
            else {
              args += readToken()
              skipWs()
              if (peekCh == ',') pos += 1
              else { expect(')'); more = false }
            }
          }
          val value =
            if (args.length == 1 && args.head == "*") ".*"
            else args.map(goQuoteMeta).mkString("|")
          cur += StreamMatcher(label,
            if (op0 == "in") "=~" else "!~", value)
        } else {
          val v = readToken()
          cur += StreamMatcher(label, op0, v)
        }
        skipWs()
        if (consumeKeyword("or")) {
          skipWs()
          if (peekCh == '}') err("missing stream matcher after 'or'")
          groups += cur.toSeq; cur.clear()
        }
        // `and` between matchers is the same as ',' (stream_filter.go:164)
        else if (consumeKeyword("and")) {
          skipWs()
          if (peekCh == '}') err("missing stream matcher after 'and'")
        }
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
      case "filter" | "where" =>
        // parsePipeFilter parses with an EMPTY field name (colon splits
        // `level:error` into field+value, same grammar as the query head)
        // and the same leading-pipe-keyword rejection (`filter stats` is
        // a parse error with a quote-it hint, parser.go:1424-1441)
        Pipe.Where(parseFilterChecked())
      case "limit" | "head" =>
        // N is optional; bare `| head` defaults to 10 (pipe_limit.go:107)
        skipWs()
        if (peekCh == '|' || peekCh == ')' || peekCh == '\u0000') Pipe.Limit(10L)
        else Pipe.Limit(readUInt("limit"))
      case "offset" | "skip" => Pipe.Offset(readUInt("offset"))
      case "sample" =>
        val n = readUInt("sample")
        if (n <= 0) err(s"sample must be bigger than 0, got $n")
        Pipe.Sample(n)
      case "sort" | "order" => parseSortPipe(descDefault = false)
      case "first" => parseFirstLast(desc = false)
      case "last" => parseFirstLast(desc = true)
      // `stats_remote` is the cluster-internal spelling of `stats`
      // (pipe.go:307 dispatches both to parsePipeStats) — same semantics
      // on a single store; Spark's distribution replaces the remote split
      case "stats" => parseStatsPipe()
      case "stats_remote" => parseStatsPipe(remote = true)
      case "top" => parseTopPipe()
      case "uniq" => parseUniqPipe()
      case "field_names" =>
        // result name may follow bare (`field_names y`) or with `as`
        // (parsePipeFieldNames, pipe_field_names.go)
        val out =
          if (consumeKeyword("as")) readToken()
          else if ({ skipWs(); peekCh != '|' && peekCh != ')' && peekCh != '\u0000' })
            readToken()
          else "name"
        Pipe.FieldNames(out)
      case "field_values" =>
        // the field may be parenthesized: `field_values (x)`
        // (parseFieldNameWithOptionalParens)
        val f = if (consume('(')) { val t = readToken(); expect(')'); t }
                else readToken()
        val lim = if (consumeKeyword("limit")) Some(readUInt("limit")) else None
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
      // the default result field is _msg for all three (pipe_len.go:156,
      // pipe_hash.go:164, pipe_json_array_len.go:173) — the value
      // OVERWRITES the message unless `as out` is given
      case "len" => parseFieldFnPipe(Pipe.Len, "_msg")
      case "hash" => parseFieldFnPipe(Pipe.Hash, "_msg")
      case "json_array_len" => parseFieldFnPipe(Pipe.JsonArrayLen, "_msg")
      case "unpack_json" =>
        val iff = parseOptIf()
        val from = parseUnpackFrom(Seq(
          "fields", "result_prefix", "keep_original_fields", "skip_empty_results"))
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
        val from = parseUnpackFrom(Seq(
          "fields", "result_prefix", "keep_original_fields", "skip_empty_results"))
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
        val from = parseUnpackFrom(Seq(
          "offset", "result_prefix", "keep_original_fields"))
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
        // dst may follow bare (`unpack_words x y`) or with `as`
        val out =
          if (consumeKeyword("as")) readToken()
          else if ({ skipWs(); peekCh != '|' && peekCh != ')' && peekCh != '\u0000' &&
                     !peekKeyword("limit") && !peekKeyword("drop_duplicates") })
            readToken()
          else from
        val lim = if (consumeKeyword("limit")) readUInt("limit") else 0L
        // pipe_unpack_words.go:163-166; `limit` is this engine's extension
        val dd = consumeKeyword("drop_duplicates")
        Pipe.UnpackWords(from, out, lim, dd)
      case "unroll" =>
        val iff = parseOptIf()
        consumeKeyword("by")
        Pipe.Unroll(parseFieldList(parens = true), iff)
      case "blocks_count" =>
        val out =
          if (consumeKeyword("as")) readToken()
          else if ({ skipWs(); peekCh != '|' && peekCh != ')' && peekCh != '\u0000' })
            readToken()
          else "blocks_count"
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
        // `by` and `on` are interchangeable (parsePipeJoin, pipe_join.go:166)
        if (!consumeKeyword("by")) consumeKeyword("on")
        val by = parseFieldList(parens = true)
        if (by.isEmpty) err("'by(...)' at 'join' must contain at least one field")
        if (by.contains("*")) err("join by '*' isn't supported")
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
        if (n < 1) err("facets N must be bigger than 0")
        // defaults from pipe_facets.go:17-24: fields with more than
        // maxValuesPerField unique values are SKIPPED (too noisy), they
        // are not capped — independent of N
        var maxPerField = 1000L
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
      .orElse(attempt(Pipe.Where(parseFilterChecked())))
      .getOrElse { pos = start; err(s"unknown pipe $shown") }
  }

  private def readLong(): Long = {
    val w = readToken()
    parseNumberLiteral(w).toLong
  }

  /** Non-negative integer count per the reference's parseUint
    * (parser.go:3183): plain/0x/0b/0o integers with `_` separators,
    * `inf` → MaxValue, byte sizes (1KiB) and durations as counts.
    * Floats without a suffix and negatives are parse errors — `limit
    * -123` / `limit 12.34` must be 400s, not silent truncations. */
  private def readUInt(what: String): Long =
    parseUIntValue(readToken())
      .getOrElse(err(s"cannot parse $what as unsigned integer"))

  private def parseUIntValue(w0: String): Option[Long] = {
    val w = w0.replace("_", "")
    val lw = w.toLowerCase
    def radix(prefix: String, r: Int): Option[Long] =
      try Some(java.lang.Long.parseLong(lw.stripPrefix(prefix), r))
      catch { case _: NumberFormatException => None }
    if (lw == "inf" || lw == "+inf") Some(Long.MaxValue)
    else if (w.nonEmpty && w.forall(_.isDigit)) w.toLongOption
    else if (lw.startsWith("0x")) radix("0x", 16)
    else if (lw.startsWith("0b")) radix("0b", 2)
    else if (lw.startsWith("0o")) radix("0o", 8)
    else NumLit.sizeValue(w).filter(_ >= 0).map(_.toLong)
      .orElse(NumLit.durationNanos(w).filter(_ >= 0))
  }

  /** getCanonicalColumnName: the empty field name is _msg. */
  private def canonField(s: String): String = if (s.isEmpty) "_msg" else s

  private def parseFieldList(parens: Boolean = false): Seq[String] = {
    skipWs()
    val hasParen = peekCh == '('
    if (hasParen) pos += 1
    val fs = ArrayBuffer.empty[String]
    skipWs()
    if (!(hasParen && peekCh == ')')) {
      fs += canonField(readToken())
      while (consume(',')) {
        skipWs()
        if (hasParen && peekCh == ')') return { pos += 1; fs.toSeq } // trailing ','
        fs += canonField(readToken())
      }
    }
    if (hasParen) expect(')')
    fs.toSeq
  }

  private def parseAsPairs(): Seq[(String, String)] = {
    // `copy a as b` and `copy a b` are equivalent — the `as` keyword is
    // optional noise (parsePipeCopy/parsePipeRename)
    val ps = ArrayBuffer.empty[(String, String)]
    var more = true
    while (more) {
      val a = readToken()
      consumeKeyword("as")
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
      skipWs()
      if (consumeKeyword("as")) out = canonField(readToken())
      else if (peekKeyword("fields")) { pos += 6; fl = parseFieldList(parens = true) }
      else if (peekCh != '|' && peekCh != ')' && peekCh != '\u0000') {
        out = canonField(readToken()) // bare result name (pipe_pack_json.go)
      }
      else more = false
    }
    (out, fl)
  }

  /** unpack_* source field: `from f`, bare `f`, or absent → _msg
    * (parsePipeUnpackJSON etc.: any token that is not an option keyword
    * is the source, `from` itself optional). */
  private def parseUnpackFrom(fences: Seq[String]): String = {
    skipWs()
    if (peekCh == '|' || peekCh == ')' || peekCh == '\u0000') return "_msg"
    if (fences.exists(peekKeyword)) return "_msg"
    consumeKeyword("from")
    canonField(readToken())
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
    // `sort by` REQUIRES the parenthesized key list; bare `sort` (no
    // `by`) sorts by all fields (parsePipeSort → parseBySortFields)
    val sawBy = consumeKeyword("by")
    skipWs()
    if (sawBy && peekCh != '(') err("missing '(' after 'sort by'")
    val keys = parseSortKeys()
    var desc = false
    var limit: Option[Long] = None
    var offset: Option[Long] = None
    var rank: Option[String] = None
    var partitionBy: Seq[String] = Nil
    var more = true
    while (more) {
      if (consumeKeyword("desc")) desc = true
      else if (consumeKeyword("asc")) ()
      else if (consumeKeyword("limit")) {
        // duplicate limit/offset clauses are parse errors (pipe_sort.go)
        if (limit.isDefined) err("duplicate 'limit' in sort pipe")
        limit = Some(readUInt("limit"))
      }
      else if (consumeKeyword("offset")) {
        if (offset.isDefined) err("duplicate 'offset' in sort pipe")
        offset = Some(readUInt("offset"))
      }
      else if (consumeKeyword("rank")) rank = Some(parseRankName())
      else if (consumeKeyword("partition")) {
        consumeKeyword("by")
        partitionBy = parseFieldList(parens = true)
      }
      else more = false
    }
    val keys2 = if (desc) keys.map(k => k.copy(desc = !k.desc)) else keys
    Pipe.Sort(keys2, limit, offset.getOrElse(0L), rank, partitionBy,
      Some(SortCanon("sort", None, keys, desc)))
  }

  /** `rank`, `rank as name`, or `rank name` (pipe_sort.go:623-640). */
  private def parseRankName(): String =
    if (consumeKeyword("as")) readToken()
    else {
      skipWs()
      val bare = peekCh != '|' && peekCh != ')' && peekCh != ',' &&
        peekCh != '\u0000' &&
        !Seq("desc", "asc", "limit", "offset", "partition", "rank")
          .exists(peekKeyword)
      if (bare) readToken() else "rank"
    }

  private def parseSortKeys(): Seq[SortKey] = {
    skipWs()
    if (peekCh != '(') return Nil
    pos += 1
    val ks = ArrayBuffer.empty[SortKey]
    skipWs()
    while (peekCh != ')' && peekCh != '\u0000') {
      val f = readToken()
      val d = if (consumeKeyword("desc")) true
              else { consumeKeyword("asc"); false }
      ks += SortKey(f, d)
      if (!consume(',')) { expect(')'); return ks.toSeq }
      skipWs() // trailing ',' before ')' allowed
    }
    expect(')')
    ks.toSeq
  }

  private def parseFirstLast(desc: Boolean): Pipe = {
    skipWs()
    val explicitN = peekCh.isDigit
    val n = if (explicitN) readLong() else 1L
    consumeKeyword("by")
    val keys0 = parseSortKeys()
    val keys = if (desc) keys0.map(k => k.copy(desc = !k.desc)) else keys0
    var rank: Option[String] = None
    var partitionBy: Seq[String] = Nil
    var more = true
    while (more) {
      if (consumeKeyword("rank")) rank = Some(parseRankName())
      else if (consumeKeyword("partition")) { consumeKeyword("by"); partitionBy = parseFieldList(parens = true) }
      else more = false
    }
    Pipe.Sort(keys, Some(n), 0L, rank, partitionBy,
      Some(SortCanon(if (desc) "last" else "first",
        if (explicitN) Some(n) else None, keys0, desc = false)))
  }

  private def parseStatsPipe(remote: Boolean = false): Pipe = {
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
    // result names must be unique and must not shadow a 'by' field
    // (parsePipeStats seenByFields/seenResultNames, pipe_stats.go)
    val byNames = by.map(_.name).toSet
    val seen = scala.collection.mutable.Set.empty[String]
    funcs.foreach { f =>
      if (byNames(f.as))
        err(s"'${f.as}' is used as 'by' field, so it cannot be a result name")
      if (!seen.add(f.as))
        err(s"duplicate result name '${f.as}' in stats pipe")
    }
    Pipe.Stats(by, funcs.toSeq, remote)
  }

  private def parseByFields(): Seq[ByField] = {
    expect('(')
    val bs = ArrayBuffer.empty[ByField]
    skipWs()
    while (peekCh != ')' && peekCh != '\u0000') {
      val name = readToken()
      var bucket: Option[String] = None
      var offset: Option[String] = None
      if (consume(':')) {
        val b = readToken()
        // bucket size must be year/month, /N ipv4 mask, a duration, or a
        // number/byte-size — `foo:bar` and negative sizes are parse
        // errors (parseByStatsFields + tryParseBucketSize)
        val ok = Parser.wordBucketSizes(b) ||
          (b.startsWith("/") && b.drop(1).nonEmpty &&
            b.drop(1).forall(_.isDigit)) ||
          durationNanos(b).exists(_ >= 0) ||
          NumLit.parse(b).exists(_ >= 0)
        if (!ok) err(s"cannot parse bucket size for field '$name': '$b'")
        bucket = Some(b)
      }
      if (consumeKeyword("offset")) {
        val o = readToken()
        val mag = if (o.startsWith("-")) o.drop(1) else o
        if (durationNanos(mag).isEmpty && NumLit.parse(mag).isEmpty)
          err(s"cannot parse bucket offset for field '$name': '$o'")
        offset = Some(o)
      }
      bs += ByField(name, bucket, offset)
      if (!consume(',')) { expect(')'); return bs.toSeq } // no trailing ','
      skipWs() // trailing ',' before ')' is allowed
    }
    expect(')')
    bs.toSeq
  }

  private def parseStatsFunc(): StatsFuncAs = {
    val name = readWord().toLowerCase
    expect('(')
    // args: possibly empty; quantile has a leading number; trailing ','
    // before ')' is tolerated like every parenthesized list
    val args = ArrayBuffer.empty[String]
    skipWs()
    while (peekCh != ')' && peekCh != '\u0000') {
      args += canonField(readToken())
      if (!consume(',')) { skipWs(); if (peekCh != ')') err("expected ',' or ')'") }
      else skipWs()
    }
    expect(')')
    var limit: Option[Long] = None
    if (consumeKeyword("limit")) limit = Some(readUInt("limit"))
    import StatsFunc._
    // an empty field-filter list means every field
    // (parseStatsFuncFieldFilters maps [] to ["*"] — `sum()` ≡ `sum(*)`)
    def fieldsOrStar: Seq[String] =
      if (args.isEmpty) Seq("*") else args.toSeq
    def arg0(fname: String): String = {
      if (args.isEmpty) err(s"$fname expects at least 1 argument")
      args.head
    }
    val fn: StatsFunc = name match {
      case "count" => Count(args.toSeq.filter(_ != "*"))
      case "count_empty" => CountEmpty(args.toSeq)
      case "count_uniq" => CountUniq(fieldsOrStar, limit)
      case "count_uniq_hash" => CountUniqHash(fieldsOrStar, limit)
      case "sum" => Sum(fieldsOrStar)
      case "avg" => Avg(fieldsOrStar)
      case "min" => Min(fieldsOrStar)
      case "max" => Max(fieldsOrStar)
      case "median" => Median(fieldsOrStar)
      case "quantile" =>
        // phi is a plain float in [0..1] (parseStatsQuantile); the field
        // list after it may be empty → every field
        val phiStr = arg0("quantile")
        val phi = phiStr.toDoubleOption
          .getOrElse(err(s"quantile phi must be a number, got '$phiStr'"))
        if (phi < 0 || phi > 1)
          err(s"quantile phi must be in [0..1], got '$phiStr'")
        // a '*' anywhere in the field list means every field, printed as
        // the bare `quantile(phi)` form (parseStatsQuantile)
        val qf = args.tail.toSeq
        Quantile(phi, if (qf.isEmpty || qf.contains("*")) Seq("*") else qf)
      case "sum_len" => SumLen(fieldsOrStar)
      case "values" => Values(fieldsOrStar, limit)
      case "uniq_values" => UniqValues(fieldsOrStar, limit)
      case "json_values" => JsonValues(fieldsOrStar, limit)
      case "row_any" => RowAny(args.toSeq.filter(_ != "*"))
      case "row_max" => RowMax(arg0("row_max"), args.tail.toSeq.filter(_ != "*"))
      case "row_min" => RowMin(arg0("row_min"), args.tail.toSeq.filter(_ != "*"))
      case "rate" => Rate()
      case "rate_sum" => RateSum(fieldsOrStar)
      case "histogram" =>
        // exactly one non-wildcard field (parseStatsHistogram)
        if (args.size != 1)
          err(s"histogram accepts exactly one field, got ${args.size}")
        if (args.head.contains("*"))
          err("histogram does not accept wildcard field filters")
        Histogram(args.head)
      case other => err(s"unknown stats function '$other'")
    }
    // optional `if (filter)` — same grammar as the pipe-level clause
    val iff = parseOptIf()
    // the reference's default result name includes the CANONICAL
    // if-clause text (pipe_stats.go: resultName = sf.String() + " " +
    // iff.String()), so `count(), count() if (foo)` do NOT collide and
    // the column name matches the reference's exactly
    val iffRaw = iff.map(f => s" if (${Canon.filter(f)})").getOrElse("")
    // optional alias: `as name` or bare name
    skipWs()
    val as =
      if (consumeKeyword("as")) canonField(readToken())
      else if (peekCh != '\u0000' && peekCh != '|' && peekCh != ',' && peekCh != ')' &&
               !peekKeyword("if")) canonField(readToken())
      else defaultStatsName(name, args.toSeq) + iffRaw
    StatsFuncAs(fn, as, iff)
  }

  /** Default result/column name = the canonical func string, like the
    * reference's sf.String(): an empty field-filter list prints as `*`
    * (`count()` → column "count(*)"); `rate()` keeps its empty parens. */
  private def defaultStatsName(name: String, args: Seq[String]): String =
    if (args.isEmpty && name != "rate") s"$name(*)"
    else s"$name(${args.mkString(", ")})"

  private def parseTopPipe(): Pipe = {
    skipWs()
    val n = if (peekCh.isDigit) readLong() else 10L
    if (n < 1) err("top N must be bigger than 0")
    val sawBy = consumeKeyword("by")
    skipWs()
    // fields: parenthesized, or bare comma-separated fenced by the
    // option keywords (parsePipeTop, pipe_top.go)
    val fields =
      if (peekCh == '(') parseFieldList(parens = true)
      else if (peekCh != '|' && peekCh != ')' && peekCh != '\u0000' &&
               !Seq("hits", "rank").exists(peekKeyword)) {
        val fs = ArrayBuffer(canonField(readToken()))
        while (consume(',')) fs += canonField(readToken())
        fs.toSeq
      }
      else if (sawBy) err("missing fields after 'by'")
      else Nil
    if (fields.isEmpty) err("expecting at least a single field in top 'by(...)'")
    var hitsAs = "hits"
    var rankAs: Option[String] = None
    var more = true
    while (more) {
      // `hits` and `rank` both take an optional `as <name>` or a bare
      // name (pipe_top.go:634-671)
      if (consumeKeyword("hits")) {
        consumeKeyword("as")
        skipWs()
        if (peekCh != '|' && peekCh != ')' && peekCh != '\u0000' &&
            !peekKeyword("rank")) hitsAs = readToken()
      }
      else if (consumeKeyword("rank")) rankAs = Some(parseRankName())
      else more = false
    }
    // the hits column must not collide with a by-field (pipe_top.go:
    // `top by (hits)` outputs "hitss")
    while (fields.contains(hitsAs)) hitsAs += "s"
    Pipe.Top(n, fields, hitsAs, rankAs)
  }

  private def parseUniqPipe(): Pipe = {
    // fields: `by (...)`, bare `(...)`, or bare comma-separated names —
    // but `with`/`hits`/`limit` are option keywords, never field names,
    // and at least one field is required (parsePipeUniq, pipe_uniq.go)
    val sawBy = consumeKeyword("by")
    skipWs()
    val fields =
      if (peekCh == '(') parseFieldList(parens = true)
      else if (peekCh != '|' && peekCh != ')' && peekCh != ' ' &&
               !Seq("with", "hits", "limit").exists(peekKeyword)) {
        val fs = ArrayBuffer(readToken())
        while (consume(',')) fs += readToken()
        fs.toSeq
      }
      else if (sawBy) err("missing fields after 'by'")
      else Nil
    if (fields.isEmpty) err("missing fields after 'uniq'")
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
      else if (consumeKeyword("limit")) limit = Some(readUInt("limit"))
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
  // climbing precedence, higher binds tighter — the inverse order of the
  // reference's mathBinaryOps priorities (pipe_math.go:153-193)
  private val mathPrec = Map(
    "default" -> 1, "or" -> 2, "|" -> 2, "xor" -> 3, "&" -> 4,
    "+" -> 5, "-" -> 5, "*" -> 6, "/" -> 6, "%" -> 6, "^" -> 7)

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
        else if (peekKeyword("or")) Some("or") // bitwise uint64 OR
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
      case c if isQuote(c) =>
        // a quoted token is a CONSTANT resolved by parseMathNumber
        // (number / RFC3339 timestamp -> nanos / IPv4 -> uint32 / NaN)
        val v = readQuoted()
        MathExpr.Num(parseMathNumber(v), Canon.quoteToken(v))
      case c if c.isDigit || c == '.' =>
        val w = readMathWord()
        MathExpr.Num(parseMathNumber(w), w)
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
    Pipe.Format(Parser.parseFormatTemplate(tpl), out, keep, skipE, iff, src = tpl)
  }

  private def parseExtractPipe(): Pipe = {
    val iff = parseOptIf()
    // the pattern may be unquoted: `extract foo<bar>baz from x` reads as
    // one compound token (getCompoundToken); '<'/'>' glue
    val pat = {
      skipWs()
      if (isQuote(peekCh)) readQuoted() else readCompoundRaw(StopsToken)
    }
    val steps = Parser.parsePatternSteps(pat)
    // parsePattern validation (pattern.go:163-198): non-first steps need
    // a delimiter, no wildcard fields, at least one NAMED field (`<_>`
    // and `<*>` are anonymous skips)
    steps.zipWithIndex.foreach { case (s, i) =>
      if (i > 0 && s.prefix.isEmpty && steps(i - 1).field.isDefined && s.field.isDefined)
        err(s"missing delimiter between <${steps(i - 1).field.get}> and <${s.field.get}>")
      s.field.foreach { n =>
        if (n.nonEmpty && n != "*" && n.endsWith("*"))
          err(s"wildcard field '<$n>' isn't supported in extract pattern")
      }
    }
    // anonymous skips parse to Some(""); at least one NAMED field required
    if (!steps.exists(_.field.exists(_.nonEmpty)))
      err(s"pattern '$pat' must contain at least one named field <field_name>")
    val from = if (consumeKeyword("from")) readToken() else "_msg"
    var keepOrig = false
    var skipEmpty = false
    var more = true
    while (more) {
      if (consumeKeyword("keep_original_fields")) keepOrig = true
      else if (consumeKeyword("skip_empty_results")) skipEmpty = true
      else more = false
    }
    Pipe.Extract(steps, from, keepOrig, skipEmpty, iff, src = pat)
  }
}

object Parser {
  def parse(q: String, nowNs: Long = System.currentTimeMillis() * 1000000L): Query =
    Optimize(new Parser(q, nowNs).parseQueryFull()).copy(evalNs = nowNs)

  /** Function-style filter names (parse dispatch parser.go:1425-1568). */
  val filterFuncs: Set[String] = Set(
    "in", "contains_all", "contains_any", "seq", "re", "i", "range",
    "ipv4_range", "string_range", "len_range", "eq_field", "le_field",
    "lt_field", "value_type", "exact")

  /** Every pipe name + alias (pipe.go:406-455) plus the stats function
    * names (usable without the `stats` keyword) — a query FILTER may not
    * start with any of these unquoted (parseFilter, parser.go:1429-1435),
    * which is what rejects `filter foo:bar`, `count()`, `foo | count`. */
  /** Word-form bucket sizes (tryParseBucketSize, pipe_stats.go:1620-1645
    * + year/month specials). */
  val wordBucketSizes: Set[String] = Set(
    "year", "month", "week", "day", "hour", "minute", "second",
    "millisecond", "microsecond", "nanosecond")

  val pipeNames: Set[String] = Set(
    "block_stats", "blocks_count", "collapse_nums", "copy", "cp",
    "decolorize", "delete", "del", "rm", "drop", "drop_empty_fields",
    "extract", "extract_regexp", "facets", "field_names", "field_values",
    "fields", "keep", "filter", "where", "first", "format", "join",
    "json_array_len", "hash", "last", "len", "limit", "head", "math",
    "eval", "offset", "skip", "pack_json", "pack_logfmt", "rename", "mv",
    "replace", "replace_regexp", "sample", "sort", "order", "stats",
    "stats_remote", "by", "stream_context", "top", "union", "uniq",
    "unpack_json", "unpack_logfmt", "unpack_syslog", "unpack_words",
    "unroll",
    // stats names (pipe_stats.go:1467-1488)
    "avg", "count", "count_empty", "count_uniq", "count_uniq_hash",
    "histogram", "json_values", "max", "median", "min", "quantile",
    "rate", "rate_sum", "row_any", "row_max", "row_min", "sum",
    "sum_len", "uniq_values", "values")

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
    // reference order (pattern.go parsePatternSteps): split on RAW '<'/'>'
    // first, html-unescape the PREFIXES after, then pull the `opt:` part
    // out of each field and trim; `<_>`/`<*>` are anonymous skips
    def unesc(str: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < str.length) {
        htmlEntityAt(str, i) match {
          case Some((ch, n)) => sb += ch; i += n
          case None => sb += str(i); i += 1
        }
      }
      sb.result()
    }
    if (pat.isEmpty) return Nil
    val steps = ArrayBuffer.empty[PatternStep]
    var s = pat
    var n = s.indexOf('<')
    if (n < 0) return Seq(PatternStep(unesc(pat), None))
    var prefix = s.substring(0, n)
    s = s.substring(n + 1)
    var done = false
    while (!done) {
      val e = s.indexOf('>')
      if (e < 0) throw ParseException(s"missing '>' for <$s", 0)
      var raw = s.substring(0, e)
      s = s.substring(e + 1)
      if (raw == "_" || raw == "*") raw = ""
      val ci = raw.indexOf(':')
      val (opt, fname) =
        if (ci >= 0) (raw.substring(0, ci).trim, raw.substring(ci + 1).trim)
        else ("", raw.trim)
      steps += PatternStep(unesc(prefix), Some(fname), opt)
      if (s.isEmpty) done = true
      else {
        n = s.indexOf('<')
        if (n < 0) { steps += PatternStep(unesc(s), None); done = true }
        else { prefix = s.substring(0, n); s = s.substring(n + 1) }
      }
    }
    steps.toSeq
  }
}
