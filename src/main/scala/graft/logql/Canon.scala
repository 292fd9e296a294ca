package graft.logql

/** Canonical LogsQL rendering — the equivalent of the reference's
  * `Query.String()` (parser.go:289-301) and the per-node String()
  * methods across filter_*.go / pipe_*.go / stats_*.go. Verified against
  * the 613 (input, canonical) pairs of the reference's own
  * TestParseQuery_Success corpus (CanonConformanceSpec).
  *
  * Used for: conformant default column names, normalized plan-cache
  * keys, and query echo surfaces.
  */
object Canon {

  // ------------------------------------------------------------- quoting

  /** reservedKeywords (parser.go:~3110): tokens that need quoting when
    * used as plain words. */
  private val reservedKeywords: Set[String] = Set(
    "", "and", "or", "not", "!", "(", ")", "{", "}", "=", "!=", "=~",
    "!~", ",", "|", ":", "*", "[", "]", "now", "offset", "-",
    "contains_all", "contains_any", "eq_field", "exact", "i", "in",
    "ipv4_range", "le_field", "len_range", "lt_field", "range", "re",
    "seq", "string_range", "value_type", "options")

  private def isTokenRune(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** needQuoteToken (parser.go:3099). */
  def needQuoteToken(s: String): Boolean = {
    val lower = s.toLowerCase
    reservedKeywords(lower) || Parser.pipeNames(lower) ||
      s.exists(c => !isTokenRune(c) && c != '.')
  }

  /** Go strconv.Quote: double-quoted with Go escape rules. */
  def goQuote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\t' => sb ++= "\\t"
      case '\r' => sb ++= "\\r"
      case '\u0007' => sb ++= "\\a"
      case '\b' => sb ++= "\\b"
      case '\f' => sb ++= "\\f"
      case '\u000b' => sb ++= "\\v"
      case c if c < 0x20 || c == 0x7f =>
        sb ++= f"\\x${c.toInt}%02x"
      case c => sb += c
    }
    sb += '"'
    sb.result()
  }

  def quoteToken(s: String): String =
    if (needQuoteToken(s)) goQuote(s) else s

  /** isNumberPrefix (parser.go:3077). */
  private def isNumberPrefix(s0: String): Boolean = {
    var s = s0
    if (s.isEmpty) return false
    if (s(0) == '-' || s(0) == '+') { s = s.tail; if (s.isEmpty) return false }
    if (s.length >= 3 && s.take(3).equalsIgnoreCase("inf")) return true
    if (s(0) == '.') { s = s.tail; if (s.isEmpty) return false }
    s(0) >= '0' && s(0) <= '9'
  }

  /** quoteStringTokenIfNeeded: string-compare operands also quote when
    * they LOOK numeric (they'd otherwise re-parse as a number filter). */
  def quoteStringToken(s: String): String =
    if (isNumberPrefix(s) || needQuoteToken(s)) goQuote(s) else s

  /** quoteFieldNameIfNeeded (filter_phrase.go:310): empty for _msg. */
  def fieldPrefix(f: String): String =
    if (f.isEmpty || f == "_msg") "" else quoteToken(f) + ":"

  /** quoteFieldFilterIfNeeded (parser.go): `f*` wildcards quote the
    * prefix only, keeping the trailing star outside the quotes. */
  def quoteFieldFilter(s: String): String =
    if (s.nonEmpty && s.endsWith("*")) {
      val w = s.dropRight(1)
      if (w.isEmpty || !needQuoteToken(w)) s else goQuote(w) + "*"
    } else quoteToken(s)

  private def fieldNames(fs: Seq[String]): String =
    fs.map(quoteFieldFilter).mkString(", ")

  // ------------------------------------------------------------- filters

  def filter(f: Filter): String = f match {
    case Filter.Noop => "*"
    case Filter.And(fs) =>
      fs.map {
        case o: Filter.Or => "(" + filter(o) + ")"
        case x => filter(x)
      }.mkString(" ")
    case Filter.Or(fs) => fs.map(filter).mkString(" or ")
    case Filter.Not(inner) => inner match {
      case _: Filter.And | _: Filter.Or => "!(" + filter(inner) + ")"
      case _ => "!" + filter(inner)
    }
    case Filter.Phrase(fd, p) => fieldPrefix(fd) + quoteToken(p)
    case Filter.Prefix(fd, p) =>
      if (p.isEmpty) fieldPrefix(fd) + "*"
      else fieldPrefix(fd) + quoteToken(p) + "*"
    case Filter.AnyCasePhrase(fd, p) => s"${fieldPrefix(fd)}i(${quoteToken(p)})"
    case Filter.AnyCasePrefix(fd, p) =>
      if (p.isEmpty) fieldPrefix(fd) + "i(*)"
      else s"${fieldPrefix(fd)}i(${quoteToken(p)}*)"
    case Filter.Exact(fd, v) => s"${fieldPrefix(fd)}=${quoteToken(v)}"
    case Filter.ExactPrefix(fd, v) => s"${fieldPrefix(fd)}=${quoteToken(v)}*"
    case Filter.In(fd, vs) =>
      s"${fieldPrefix(fd)}in(${vs.map(quoteToken).mkString(",")})"
    case Filter.InQuery(fd, sub) => s"${fieldPrefix(fd)}in(${query(sub)})"
    case Filter.ContainsAll(fd, vs) =>
      s"${fieldPrefix(fd)}contains_all(${vs.map(quoteToken).mkString(",")})"
    case Filter.ContainsAny(fd, vs) =>
      s"${fieldPrefix(fd)}contains_any(${vs.map(quoteToken).mkString(",")})"
    case Filter.ContainsQuery(fd, sub, all) =>
      val fn = if (all) "contains_all" else "contains_any"
      s"${fieldPrefix(fd)}$fn(${query(sub)})"
    case Filter.Sequence(fd, ps) =>
      s"${fieldPrefix(fd)}seq(${ps.map(quoteToken).mkString(",")})"
    case Filter.Regexp(fd, re) => s"${fieldPrefix(fd)}~${quoteToken(re)}"
    case r: Filter.Range => fieldPrefix(r.field) + r.repr
    case r: Filter.StringRange => fieldPrefix(r.field) + r.repr
    case r: Filter.LenRange => fieldPrefix(r.field) + r.repr
    case Filter.Ipv4Range(fd, lo, hi) =>
      s"${fieldPrefix(fd)}ipv4_range(${ipv4(lo)}, ${ipv4(hi)})"
    case Filter.ValueType(fd, t) => s"${fieldPrefix(fd)}value_type(${quoteToken(t)})"
    case Filter.EqField(fd, o) => s"${fieldPrefix(fd)}eq_field(${quoteToken(o)})"
    case Filter.LeField(fd, o) => s"${fieldPrefix(fd)}le_field(${quoteToken(o)})"
    case Filter.LtField(fd, o) => s"${fieldPrefix(fd)}lt_field(${quoteToken(o)})"
    case t: Filter.TimeRange => "_time:" + t.repr
    case d: Filter.DayRange => "_time:day_range" + d.repr
    case w: Filter.WeekRange => "_time:week_range" + w.repr
    case Filter.Stream(groups) =>
      "{" + groups.map(_.map(m =>
        quoteToken(m.label) + m.op + goQuote(m.value)).mkString(","))
        .mkString(" or ") + "}"
    case Filter.StreamId(ids) =>
      if (ids.size == 1) "_stream_id:" + ids.head
      else s"_stream_id:in(${ids.mkString(",")})"
  }

  private def ipv4(n: Long): String =
    s"${(n >> 24) & 0xff}.${(n >> 16) & 0xff}.${(n >> 8) & 0xff}.${n & 0xff}"

  private def iffStr(iff: Option[Filter]): String =
    iff.map(f => s" if (${filter(f)})").getOrElse("")

  // --------------------------------------------------------- stats funcs

  def statsFunc(fn: StatsFunc): String = {
    import StatsFunc._
    def ff(name: String, fields: Seq[String]): String =
      s"$name(${fieldNames(fields)})"
    def lim(s: String, l: Option[Long]): String =
      l.filter(_ > 0).map(v => s"$s limit $v").getOrElse(s)
    fn match {
      case Count(fs) => if (fs.isEmpty) "count(*)" else ff("count", fs)
      case CountEmpty(fs) =>
        if (fs.isEmpty || fs == Seq("*")) "count_empty(*)" else ff("count_empty", fs)
      case CountUniq(fs, l) => lim(ff("count_uniq", fs), l)
      case CountUniqHash(fs, l) => lim(ff("count_uniq_hash", fs), l)
      case Sum(fs) => ff("sum", fs)
      case Avg(fs) => ff("avg", fs)
      case Min(fs) => ff("min", fs)
      case Max(fs) => ff("max", fs)
      case Median(fs) => ff("median", fs)
      case Quantile(phi, fs) =>
        if (fs == Seq("*")) s"quantile(${num(phi)})"
        else s"quantile(${num(phi)}, ${fieldNames(fs)})"
      case SumLen(fs) => ff("sum_len", fs)
      case Values(fs, l) => lim(ff("values", fs), l)
      case UniqValues(fs, l) => lim(ff("uniq_values", fs), l)
      case JsonValues(fs, l) => lim(ff("json_values", fs), l)
      case RowAny(fs) => if (fs.isEmpty) "row_any()" else ff("row_any", fs)
      case RowMax(f0, fs) => s"row_max(${fieldNames(f0 +: fs)})"
      case RowMin(f0, fs) => s"row_min(${fieldNames(f0 +: fs)})"
      case Rate(_) => "rate()"
      case RateSum(fs, _) => ff("rate_sum", fs)
      case Histogram(f0) => s"histogram(${quoteToken(f0)})"
    }
  }

  def num(v: Double): String =
    if (v == v.toLong.toDouble) v.toLong.toString else v.toString

  private def byField(b: ByField): String = {
    val base = quoteFieldFilter(b.name) +
      b.bucket.map(bk => ":" + bk).getOrElse("")
    base + b.offset.map(o => s" offset $o").getOrElse("")
  }

  // --------------------------------------------------------------- pipes

  def pipe(p: Pipe): String = p match {
    case Pipe.Fields(fs) => "fields " + fieldNames(fs)
    case Pipe.Delete(fs) => "delete " + fieldNames(fs)
    case Pipe.Copy(pairs) => "copy " + pairs.map { case (a, b) =>
      s"${quoteFieldFilter(a)} as ${quoteFieldFilter(b)}" }.mkString(", ")
    case Pipe.Rename(pairs) => "rename " + pairs.map { case (a, b) =>
      s"${quoteFieldFilter(a)} as ${quoteFieldFilter(b)}" }.mkString(", ")
    case Pipe.Where(f) => "filter " + filter(f)
    case Pipe.Limit(n) => s"limit $n"
    case Pipe.Offset(n) => s"offset $n"
    case Pipe.Sample(n) => s"sample $n"
    case s: Pipe.Sort => sortPipe(s)
    case Pipe.Stats(by, funcs, remote) =>
      val byS = if (by.isEmpty) "" else s" by (${by.map(byField).mkString(", ")})"
      val fnS = funcs.map { fa =>
        statsFunc(fa.fn) + iffStr(fa.iff) + " as " + quoteToken(fa.as)
      }.mkString(", ")
      val kw = if (remote) "stats_remote" else "stats"
      s"$kw$byS $fnS"
    case Pipe.Top(n, fs, hitsAs, rankAs) =>
      val base = (if (n != 10) s"top $n" else "top") + s" by (${fieldNames(fs)})"
      val h = if (hitsAs != "hits") s" hits as ${quoteToken(hitsAs)}" else ""
      val r = rankAs.map(x => rankStr(x)).getOrElse("")
      base + h + r
    case Pipe.Uniq(fs, withHits, limit) =>
      s"uniq by (${fieldNames(fs)})" +
        (if (withHits) " with hits" else "") +
        limit.filter(_ > 0).map(l => s" limit $l").getOrElse("")
    case Pipe.FieldNames(out) =>
      "field_names" + (if (out != "name") " as " + quoteToken(out) else "")
    case Pipe.FieldValues(fd, limit) =>
      s"field_values ${quoteToken(fd)}" +
        limit.filter(_ > 0).map(l => s" limit $l").getOrElse("")
    case Pipe.Math(exprs) =>
      "math " + exprs.map { case (e, as) =>
        s"${MathExpr.render(e)} as ${quoteToken(as)}" }.mkString(", ")
    case f: Pipe.Format =>
      "format" + iffStr(f.iff) + " " + quoteToken(f.src) +
        (if (f.out != "_msg" && f.out.nonEmpty) " as " + quoteToken(f.out) else "") +
        (if (f.keepOriginal) " keep_original_fields" else "") +
        (if (f.skipEmpty) " skip_empty_results" else "")
    case e: Pipe.Extract =>
      "extract" + iffStr(e.iff) + " " + quoteToken(e.src) +
        (if (e.from != "_msg" && e.from.nonEmpty) " from " + quoteToken(e.from) else "") +
        (if (e.keepOriginal) " keep_original_fields" else "") +
        (if (e.skipEmpty) " skip_empty_results" else "")
    case e: Pipe.ExtractRegexp =>
      "extract_regexp" + iffStr(e.iff) + " " + quoteToken(e.re) +
        (if (e.from != "_msg" && e.from.nonEmpty) " from " + quoteToken(e.from) else "") +
        (if (e.keepOriginal) " keep_original_fields" else "") +
        (if (e.skipEmpty) " skip_empty_results" else "")
    case r: Pipe.Replace =>
      "replace" + iffStr(r.iff) +
        s" (${quoteToken(r.oldS)}, ${quoteToken(r.newS)})" +
        (if (r.at != "_msg") " at " + quoteToken(r.at) else "") +
        (if (r.limit > 0) s" limit ${r.limit}" else "")
    case r: Pipe.ReplaceRegexp =>
      "replace_regexp" + iffStr(r.iff) +
        s" (${quoteToken(r.re)}, ${quoteToken(r.repl)})" +
        (if (r.at != "_msg") " at " + quoteToken(r.at) else "") +
        (if (r.limit > 0) s" limit ${r.limit}" else "")
    case Pipe.Len(fd, out) =>
      s"len(${quoteToken(fd)})" +
        (if (out != "_msg" && out.nonEmpty) " as " + quoteToken(out) else "")
    case Pipe.Hash(fd, out) =>
      s"hash(${quoteToken(fd)})" +
        (if (out != "_msg" && out.nonEmpty) " as " + quoteToken(out) else "")
    case Pipe.JsonArrayLen(fd, out) =>
      s"json_array_len(${quoteToken(fd)})" +
        (if (out != "_msg" && out.nonEmpty) " as " + quoteToken(out) else "")
    case u: Pipe.UnpackJson => unpackStr("unpack_json", u.iff, u.from,
      u.fieldsList, u.prefix, u.keepOriginal, u.skipEmpty)
    case u: Pipe.UnpackLogfmt => unpackStr("unpack_logfmt", u.iff, u.from,
      u.fieldsList, u.prefix, u.keepOriginal, u.skipEmpty)
    case u: Pipe.UnpackSyslog =>
      "unpack_syslog" + iffStr(u.iff) +
        (if (u.from != "_msg") " from " + quoteToken(u.from) else "") +
        (if (u.offsetNs != 0) s" offset ${durStr(u.offsetNs)}" else "") +
        (if (u.prefix.nonEmpty) " result_prefix " + quoteToken(u.prefix) else "") +
        (if (u.keepOriginal) " keep_original_fields" else "")
    case u: Pipe.UnpackWords =>
      "unpack_words" +
        (if (u.from != "_msg") " from " + quoteToken(u.from) else "") +
        (if (u.out != u.from) " as " + quoteToken(u.out) else "") +
        (if (u.limit > 0) s" limit ${u.limit}" else "") +
        (if (u.dropDuplicates) " drop_duplicates" else "")
    case Pipe.Unroll(fs, iff) =>
      "unroll" + iffStr(iff) + s" by (${fieldNames(fs)})"
    case Pipe.BlocksCount(out) =>
      "blocks_count" + (if (out != "blocks_count") " as " + quoteToken(out) else "")
    case Pipe.BlockStats => "block_stats"
    case Pipe.PackJson(out, fs) =>
      "pack_json" + (if (fs.nonEmpty) " fields (" + fieldNames(fs) + ")" else "") +
        (if (out != "_msg") " as " + quoteToken(out) else "")
    case Pipe.PackLogfmt(out, fs) =>
      "pack_logfmt" + (if (fs.nonEmpty) " fields (" + fieldNames(fs) + ")" else "") +
        (if (out != "_msg") " as " + quoteToken(out) else "")
    case Pipe.DropEmptyFields => "drop_empty_fields"
    case Pipe.Decolorize(fd) =>
      "decolorize" + (if (fd != "_msg") " " + quoteToken(fd) else "")
    case c: Pipe.CollapseNums =>
      "collapse_nums" + iffStr(c.iff) +
        (if (c.field != "_msg") " at " + quoteToken(c.field) else "") +
        (if (c.prettify) " prettify" else "")
    case j: Pipe.Join =>
      s"join by (${fieldNames(j.by)}) (${query(j.sub)})" +
        (if (j.inner) " inner" else "") +
        j.prefix.map(p => " prefix " + quoteToken(p)).getOrElse("")
    case sc: Pipe.StreamContext =>
      "stream_context" +
        (if (sc.before > 0) s" before ${sc.before}" else "") +
        (if (sc.after > 0) s" after ${sc.after}" else "") +
        (if (sc.timeWindowNs != 3600L * 1000000000L)
          s" time_window ${durStr(sc.timeWindowNs)}" else "")
    case Pipe.Union(sub) => s"union (${query(sub)})"
    case f: Pipe.Facets =>
      "facets" + (if (f.n != 10) s" ${f.n}" else "") +
        (if (f.maxValuesPerField != 1000) s" max_values_per_field ${f.maxValuesPerField}" else "") +
        (if (f.maxValueLen != 128) s" max_value_len ${f.maxValueLen}" else "") +
        (if (f.keepConstFields) " keep_const_fields" else "")
  }

  private def unpackStr(name: String, iff: Option[Filter], from: String,
                        fieldsList: Seq[String], prefix: String,
                        keepOriginal: Boolean, skipEmpty: Boolean): String =
    name + iffStr(iff) +
      (if (from != "_msg") " from " + quoteToken(from) else "") +
      (if (fieldsList.nonEmpty) " fields (" + fieldNames(fieldsList) + ")" else "") +
      (if (prefix.nonEmpty) " result_prefix " + quoteToken(prefix) else "") +
      (if (keepOriginal) " keep_original_fields" else "") +
      (if (skipEmpty) " skip_empty_results" else "")

  private def rankStr(name: String): String =
    if (name == "rank") " rank" else s" rank as ${quoteToken(name)}"

  private def sortPipe(s: Pipe.Sort): String = {
    val c = s.canon.getOrElse(
      SortCanon("sort", None, s.keys, desc = false))
    val form = c.form
    var out = form
    if (form == "first" || form == "last") {
      c.n.foreach(n => out += s" $n")
      if (c.keys.nonEmpty)
        out += " by (" + c.keys.map(k =>
          quoteFieldFilter(k.field) + (if (k.desc) " desc" else "")).mkString(", ") + ")"
      if (s.partitionBy.nonEmpty)
        out += " partition by (" + fieldNames(s.partitionBy) + ")"
      s.rank.foreach(r => out += s" rank as ${quoteToken(r)}")
      out
    } else {
      if (c.keys.nonEmpty)
        out += " by (" + c.keys.map(k =>
          quoteFieldFilter(k.field) + (if (k.desc) " desc" else "")).mkString(", ") + ")"
      if (c.desc) out += " desc"
      if (s.partitionBy.nonEmpty)
        out += " partition by (" + fieldNames(s.partitionBy) + ")"
      if (s.offset > 0) out += s" offset ${s.offset}"
      s.limit.filter(_ > 0).foreach(l => out += s" limit $l")
      s.rank.foreach(r => out += rankStr(r))
      out
    }
  }

  /** Go duration rendering (time.Duration.String, simplified to the
    * units LogsQL uses): 1h30m0s style would be Go's; the reference
    * prints durations via its own marshalDuration — iterate from weeks
    * down, omitting zero units. */
  def durStr(ns0: Long): String = {
    var ns = ns0
    if (ns == 0) return "0s"
    val sb = new StringBuilder
    if (ns < 0) { sb += '-'; ns = -ns }
    val units = Seq(
      "w" -> 7L * 86400 * 1000000000L,
      "d" -> 86400L * 1000000000L,
      "h" -> 3600L * 1000000000L,
      "m" -> 60L * 1000000000L,
      "s" -> 1000000000L,
      "ms" -> 1000000L,
      "µs" -> 1000L,
      "ns" -> 1L)
    for ((u, size) <- units) {
      if (ns >= size) {
        sb ++= (ns / size).toString; sb ++= u
        ns %= size
      }
    }
    sb.result()
  }

  // --------------------------------------------------------------- query

  def options(opts: Map[String, String]): String = {
    val parts = Seq.newBuilder[String]
    opts.get("concurrency").foreach { v =>
      val n = v.replace("_", "").toLongOption.getOrElse(0L)
      if (n > 0) parts += s"concurrency=${math.min(n, 1024L)}"
    }
    opts.get("ignore_global_time_filter").foreach { v =>
      val b = Set("true", "1", "t")(v.toLowerCase)
      parts += s"ignore_global_time_filter=$b"
    }
    val a = parts.result()
    if (a.isEmpty) "" else "options(" + a.mkString(", ") + ")"
  }

  def query(q: Query): String = {
    val o = options(q.options)
    val head = (if (o.nonEmpty) o + " " else "") + filter(q.filter)
    (head +: q.pipes.map(pipe)).mkString(" | ")
  }
}
