package graft.logql

/** LogsQL abstract syntax tree.
  *
  * Mirrors the reference grammar (lib/logstorage/parser.go:250-259:
  * `Query{f filter, pipes []pipe}`): a query is a leaf filter expression
  * followed by a chain of dataflow pipes. Semantics only — execution is
  * compiled to Spark DataFrame transforms in [[Compiler]].
  */
/** `evalNs`: the timestamp the query was parsed at — relative `_time:5m`
  * filters and `now` math already resolved against it, so running the
  * SAME Query later must reuse it (the reference pins the evaluation
  * timestamp per request: logsql.go:1155-1171 time arg). 0 = unset, run
  * at the caller's clock. */
final case class Query(filter: Filter, pipes: Seq[Pipe],
                       options: Map[String, String] = Map.empty,
                       evalNs: Long = 0L)

object Query {
  /** The reference's Query.AddTimeFilter (parser.go:530-545): conjoin
    * the GLOBAL [startNs, endNs] (both INCLUSIVE) onto this query and
    * every nested subquery, skipping queries that opted out via
    * options(ignore_global_time_filter=true). The injected filter
    * carries the reference's canonical repr (`[rfc3339,rfc3339]`). */
  def addTimeFilter(q: Query, startNs: Long, endNs: Long): Query = {
    def rfc(ns: Long): String = {
      val i = java.time.Instant.ofEpochSecond(
        Math.floorDiv(ns, 1000000000L), Math.floorMod(ns, 1000000000L))
      val base = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS")
        .withZone(java.time.ZoneOffset.UTC).format(i)
      base.replaceAll("\\.?0+$", "") + "Z" // RFC3339Nano trims zeros
    }
    def ignores(sub: Query): Boolean =
      sub.options.get("ignore_global_time_filter")
        // Go strconv.ParseBool spellings
        .exists(v => Set("1", "t", "T", "TRUE", "true", "True").contains(v))
    val repr = s"[${rfc(startNs)},${rfc(endNs)}]"
    // inclusive end -> this AST's exclusive upper bound
    val hi = if (endNs == Long.MaxValue) Long.MaxValue else endNs + 1
    val tr = Filter.TimeRange(startNs, hi, repr)
    transformWithSubqueries(q) { sub =>
      if (ignores(sub)) sub
      else sub.copy(filter = sub.filter match {
        case Filter.Noop => Filter.And(Seq(tr, Filter.Noop))
        case Filter.And(fs) => Filter.And(tr +: fs)
        case other => Filter.And(Seq(tr, other))
      })
    }
  }

  /** GetFilterTimeRange (parser.go:504-525): the intersection of the
    * TOP-LEVEL `_time` range filters (a direct filter or AND members;
    * day_range/week_range and nested OR structure don't bound it), as
    * INCLUSIVE ns bounds — this AST's TimeRange carries an exclusive
    * upper bound, so it converts back here. */
  def filterTimeRange(q: Query): (Long, Long) = {
    def bounds(f: Filter): Option[(Long, Long)] = f match {
      case Filter.TimeRange(lo, hi, _) =>
        Some((lo, if (hi == Long.MaxValue) Long.MaxValue else hi - 1))
      case _ => None
    }
    q.filter match {
      case Filter.And(fs) =>
        fs.flatMap(bounds).foldLeft((Long.MinValue, Long.MaxValue)) {
          case ((lo, hi), (l, h)) => (math.max(lo, l), math.min(hi, h))
        }
      case f => bounds(f).getOrElse((Long.MinValue, Long.MaxValue))
    }
  }

  /** Rewrite `q` AND every nested subquery with `f` — in(subquery),
    * contains_all/any(subquery), join/union pipes, and the if(...)
    * conditions of pipes and stats functions, innermost first. This is
    * the reference's `visitSubqueries` (parser.go:642-657): HTTP-level
    * conjuncts like the [start, end) time range and extra_filters apply
    * to nested queries too, so a join subquery over years of retention
    * is bounded exactly like its parent. */
  def transformWithSubqueries(q: Query)(f: Query => Query): Query = {
    def tq(q: Query): Query =
      f(q.copy(filter = tf(q.filter), pipes = q.pipes.map(tp)))
    def tf(fl: Filter): Filter = fl match {
      case Filter.And(fs) => Filter.And(fs.map(tf))
      case Filter.Or(fs) => Filter.Or(fs.map(tf))
      case Filter.Not(x) => Filter.Not(tf(x))
      case Filter.InQuery(fd, sub) => Filter.InQuery(fd, tq(sub))
      case Filter.ContainsQuery(fd, sub, all) =>
        Filter.ContainsQuery(fd, tq(sub), all)
      case other => other
    }
    def tp(p: Pipe): Pipe = p match {
      case j: Pipe.Join => j.copy(sub = tq(j.sub))
      case Pipe.Union(sub) => Pipe.Union(tq(sub))
      case Pipe.Where(x) => Pipe.Where(tf(x))
      case x: Pipe.Format => x.copy(iff = x.iff.map(tf))
      case x: Pipe.Extract => x.copy(iff = x.iff.map(tf))
      case x: Pipe.ExtractRegexp => x.copy(iff = x.iff.map(tf))
      case x: Pipe.UnpackJson => x.copy(iff = x.iff.map(tf))
      case x: Pipe.UnpackLogfmt => x.copy(iff = x.iff.map(tf))
      case x: Pipe.UnpackSyslog => x.copy(iff = x.iff.map(tf))
      case x: Pipe.Unroll => x.copy(iff = x.iff.map(tf))
      case x: Pipe.Replace => x.copy(iff = x.iff.map(tf))
      case x: Pipe.ReplaceRegexp => x.copy(iff = x.iff.map(tf))
      case x: Pipe.CollapseNums => x.copy(iff = x.iff.map(tf))
      case s: Pipe.Stats =>
        s.copy(funcs = s.funcs.map(fa => fa.copy(iff = fa.iff.map(tf))))
      case other => other
    }
    tq(q)
  }
}

// ---------------------------------------------------------------------------
// Filters (reference: lib/logstorage/filter_*.go, SURVEY.md §2.1)
// ---------------------------------------------------------------------------

sealed trait Filter

object Filter {
  /** "No upper bound" sentinel for StringRange built from `field:>V`
    * string compares — compiled as a lower-bound-only predicate (a literal
    * max string does not exist under binary UTF-8 ordering: supplementary-
    * plane code points encode above U+FFFF). */
  val MaxStringRange: String = "\uFFFF\uFFFF\uFFFF\uFFFF"

  /** Implicit/explicit AND of space-separated filters (filter_and.go). */
  final case class And(fs: Seq[Filter]) extends Filter
  final case class Or(fs: Seq[Filter]) extends Filter
  final case class Not(f: Filter) extends Filter
  /** `*` — match-all (filter_noop.go). */
  case object Noop extends Filter

  /** `field:phrase` — tokenized word/phrase match (filter_phrase.go).
    * Empty phrase matches rows where the field is empty/missing. */
  final case class Phrase(field: String, phrase: String) extends Filter
  /** `field:foo*` — word-prefix match (filter_prefix.go). Empty prefix
    * (`field:*`) matches any non-empty value. */
  final case class Prefix(field: String, prefix: String) extends Filter
  /** `field:i(phrase)` (filter_any_case_phrase.go). */
  final case class AnyCasePhrase(field: String, phrase: String) extends Filter
  /** `field:i(prefix*)` (filter_any_case_prefix.go). */
  final case class AnyCasePrefix(field: String, prefix: String) extends Filter
  /** `field:=value` — whole-value equality (filter_exact.go). */
  final case class Exact(field: String, value: String) extends Filter
  /** `field:=value*` — whole-value prefix (filter_exact_prefix.go). */
  final case class ExactPrefix(field: String, value: String) extends Filter
  /** `field:in(v1, ..., vN)` (filter_in.go). */
  final case class In(field: String, values: Seq[String]) extends Filter
  /** `field:in(subquery)` — values materialized from a nested query
    * (filter_in.go + initFilterInValues storage_search.go:582). */
  final case class InQuery(field: String, sub: Query) extends Filter
  /** `field:contains_all(w1, ...)` (filter_contains_all.go). */
  final case class ContainsAll(field: String, values: Seq[String]) extends Filter
  /** `field:contains_any(w1, ...)` (filter_contains_any.go). */
  final case class ContainsAny(field: String, values: Seq[String]) extends Filter
  /** `field:contains_all(subquery)` / `field:contains_any(subquery)` —
    * phrases materialized from a nested query, like in(subquery)
    * (LogsQL.md "arbitrary query inside contains_all/contains_any"). */
  final case class ContainsQuery(field: String, sub: Query,
                                 all: Boolean) extends Filter
  /** `field:seq(w1, w2, ...)` — phrases in order (filter_sequence.go). */
  final case class Sequence(field: String, phrases: Seq[String]) extends Filter
  /** `field:~"re"` / `field:re("re")` (filter_regexp.go). */
  final case class Regexp(field: String, re: String) extends Filter
  /** `field:range(lo, hi)`, `field:>x` etc. (filter_range.go). */
  final case class Range(field: String, lo: Double, hi: Double,
                         inclLo: Boolean, inclHi: Boolean,
                         repr: String = "") extends Filter
  /** `field:ipv4_range(lo, hi)` — bounds as uint32 (filter_ipv4_range.go). */
  final case class Ipv4Range(field: String, lo: Long, hi: Long) extends Filter
  /** `field:string_range(a, b)` — a <= v < b (filter_string_range.go). */
  final case class StringRange(field: String, lo: String, hi: String,
                               repr: String = "") extends Filter
  /** `field:len_range(lo, hi)` — value length inclusive (filter_len_range.go). */
  final case class LenRange(field: String, lo: Long, hi: Long,
                            repr: String = "") extends Filter
  /** `field:value_type(t)` — rows whose storage type is t
    * (filter_value_type.go:67). In the Spark layout the physical type is
    * per-column (per-relation), not per-block. */
  final case class ValueType(field: String, t: String) extends Filter
  /** `field:eq_field(other)` (filter_eq_field.go). */
  final case class EqField(field: String, other: String) extends Filter
  /** `field:le_field(other)` / `lt_field` (filter_le_field.go). */
  final case class LeField(field: String, other: String) extends Filter
  final case class LtField(field: String, other: String) extends Filter
  /** `_time:[a, b)` resolved to epoch-nanos half-open range (filter_time.go). */
  final case class TimeRange(loNs: Long, hiNs: Long,
                             repr: String = "") extends Filter
  /** `_time:day_range[08:00, 18:00)` — nanosecond offsets within the day,
    * inclusive both ends; bound exclusivity is folded into ±1ns at parse
    * like the reference (parser.go parseFilterDayRange;
    * filter_day_range.go:13-20 keeps start/end as day-offset nanos). */
  final case class DayRange(startNs: Long, endNs: Long,
                            offsetNs: Long = 0L,
                            repr: String = "") extends Filter
  /** `_time:week_range[Mon, Fri]` — day of week 0=Sun, inclusive both
    * ends; exclusivity folds into ±1 day at parse (filter_week_range.go). */
  final case class WeekRange(startDay: Int, endDay: Int,
                             offsetNs: Long = 0L,
                             repr: String = "") extends Filter
  /** `{label=~"re", ...}` — stream label matchers, OR of AND-groups
    * (filter_stream.go, stream_filter.go). */
  final case class Stream(orGroups: Seq[Seq[StreamMatcher]]) extends Filter
  /** `_stream_id:hex` (filter_stream_id.go). */
  final case class StreamId(ids: Seq[String]) extends Filter
}

/** One `label op "value"` matcher inside `{...}`; op ∈ =, !=, =~, !~. */
final case class StreamMatcher(label: String, op: String, value: String)

// ---------------------------------------------------------------------------
// Pipes (reference: lib/logstorage/pipe_*.go, SURVEY.md §2.2)
// ---------------------------------------------------------------------------

sealed trait Pipe

object Pipe {
  final case class Fields(fields: Seq[String]) extends Pipe
  final case class Delete(fields: Seq[String]) extends Pipe
  final case class Copy(pairs: Seq[(String, String)]) extends Pipe
  final case class Rename(pairs: Seq[(String, String)]) extends Pipe
  final case class Where(f: Filter) extends Pipe
  final case class Limit(n: Long) extends Pipe
  final case class Offset(n: Long) extends Pipe
  /** keep each row with probability 1/n (pipe_sample.go). */
  final case class Sample(n: Long) extends Pipe
  final case class Sort(keys: Seq[SortKey], limit: Option[Long], offset: Long,
                        rank: Option[String], partitionBy: Seq[String],
                        canon: Option[SortCanon] = None) extends Pipe
  /** `remote` marks the `stats_remote` spelling (pipe.go:307) — same
    * local semantics; kept for canonical rendering. */
  final case class Stats(by: Seq[ByField], funcs: Seq[StatsFuncAs],
                         remote: Boolean = false) extends Pipe
  final case class Top(n: Long, fields: Seq[String], hitsAs: String,
                       rankAs: Option[String]) extends Pipe
  final case class Uniq(fields: Seq[String], withHits: Boolean,
                        limit: Option[Long]) extends Pipe
  final case class FieldNames(out: String) extends Pipe
  final case class FieldValues(field: String, limit: Option[Long]) extends Pipe
  final case class Math(exprs: Seq[(MathExpr, String)]) extends Pipe
  /** `format "tpl<fld>" as out` — template parts are Left(literal) or
    * Right((transform, field)); transform "" = raw (pipe_format.go). */
  final case class Format(parts: Seq[Either[String, (String, String)]],
                          out: String,
                          keepOriginal: Boolean = false,
                          skipEmpty: Boolean = false,
                          iff: Option[Filter] = None,
                          src: String = "") extends Pipe
  /** `extract "prefix<f1>sep<f2>" from field` (pipe_extract.go/pattern.go). */
  final case class Extract(steps: Seq[PatternStep], from: String,
                           keepOriginal: Boolean, skipEmpty: Boolean,
                           iff: Option[Filter] = None,
                           src: String = "") extends Pipe
  final case class ExtractRegexp(re: String, from: String,
                                 keepOriginal: Boolean = false,
                                 skipEmpty: Boolean = false,
                                 iff: Option[Filter] = None) extends Pipe
  final case class Replace(oldS: String, newS: String, at: String,
                           limit: Long,
                           iff: Option[Filter] = None) extends Pipe
  final case class ReplaceRegexp(re: String, repl: String, at: String,
                                 limit: Long,
                                 iff: Option[Filter] = None) extends Pipe
  final case class Len(field: String, out: String) extends Pipe
  final case class Hash(field: String, out: String) extends Pipe
  final case class JsonArrayLen(field: String, out: String) extends Pipe
  // keepOriginal = non-empty existing fields win over unpacked values;
  // skipEmpty = empty unpacked values never overwrite; iff = rows failing
  // the filter pass through unchanged (pipe_unpack_json.go:137-186)
  final case class UnpackJson(from: String, fieldsList: Seq[String],
                              prefix: String,
                              keepOriginal: Boolean = false,
                              skipEmpty: Boolean = false,
                              iff: Option[Filter] = None) extends Pipe
  final case class UnpackLogfmt(from: String, fieldsList: Seq[String],
                                prefix: String,
                                keepOriginal: Boolean = false,
                                skipEmpty: Boolean = false,
                                iff: Option[Filter] = None) extends Pipe
  final case class UnpackSyslog(from: String, prefix: String,
      offsetNs: Long = 0L,
      keepOriginal: Boolean = false,
      iff: Option[Filter] = None) extends Pipe
  final case class UnpackWords(from: String, out: String,
                               limit: Long,
                               dropDuplicates: Boolean = false) extends Pipe
  final case class Unroll(fields: Seq[String],
                          iff: Option[Filter] = None) extends Pipe
  /** `blocks_count` — scanned-block count; Spark analogue: distinct input
    * files (pipe_blocks_count.go; file ≈ part/block). */
  final case class BlocksCount(out: String) extends Pipe
  /** `block_stats` — per-block storage stats; Spark analogue: per input
    * file (pipe_block_stats.go). */
  case object BlockStats extends Pipe
  final case class PackJson(out: String, fieldsList: Seq[String]) extends Pipe
  final case class PackLogfmt(out: String, fieldsList: Seq[String]) extends Pipe
  case object DropEmptyFields extends Pipe
  final case class Decolorize(field: String) extends Pipe
  final case class CollapseNums(field: String, prettify: Boolean,
                                iff: Option[Filter] = None) extends Pipe
  final case class Join(by: Seq[String], sub: Query, inner: Boolean,
                        prefix: Option[String]) extends Pipe
  /** `stream_context before N after M [time_window d]` — surrounding rows
    * from the same stream (pipe_stream_context.go:27-40, default window
    * 1h at :22). */
  final case class StreamContext(before: Int, after: Int,
                                 timeWindowNs: Long) extends Pipe
  final case class Union(sub: Query) extends Pipe
  final case class Facets(n: Long, maxValuesPerField: Long,
                          maxValueLen: Long,
                          keepConstFields: Boolean = false) extends Pipe
}

/** `sort by (f desc)` key. */
final case class SortKey(field: String, desc: Boolean)

/** Canonical-rendering metadata for a sort pipe: the surface form the
  * user wrote (`sort`, `order`, `first`, `last` — first/last print in
  * their own shape, parser_test canonicals), the keys BEFORE the global
  * `desc`/first-last flip was folded in, and the explicit N if any.
  * Semantics live in [[Pipe.Sort]]'s own fields; this is display-only. */
final case class SortCanon(form: String, n: Option[Long],
                           keys: Seq[SortKey], desc: Boolean)

/** `by (name:bucket offset o)` group key (pipe_stats.go:1495-1605).
  * bucket examples: "1h" (duration), "10" (numeric), "1KiB" (size). */
final case class ByField(name: String, bucket: Option[String],
                         offset: Option[String])

/** One step of an `extract` pattern: after literal `prefix`, capture
  * into `field` (None = trailing literal, Some("") = anonymous skip);
  * `opt` is the `<opt:name>` modifier — "plain" disables quote-aware
  * capture (pattern.go patternStep). */
final case class PatternStep(prefix: String, field: Option[String],
                             opt: String = "")

// ---------------------------------------------------------------------------
// Stats functions (reference: lib/logstorage/stats_*.go, SURVEY.md §2.3)
// ---------------------------------------------------------------------------

final case class StatsFuncAs(fn: StatsFunc, as: String, iff: Option[Filter])

sealed trait StatsFunc

object StatsFunc {
  final case class Count(fields: Seq[String]) extends StatsFunc
  final case class CountEmpty(fields: Seq[String]) extends StatsFunc
  final case class CountUniq(fields: Seq[String], limit: Option[Long]) extends StatsFunc
  final case class CountUniqHash(fields: Seq[String], limit: Option[Long] = None) extends StatsFunc
  final case class Sum(fields: Seq[String]) extends StatsFunc
  final case class Avg(fields: Seq[String]) extends StatsFunc
  final case class Min(fields: Seq[String]) extends StatsFunc
  final case class Max(fields: Seq[String]) extends StatsFunc
  final case class Median(fields: Seq[String]) extends StatsFunc
  final case class Quantile(phi: Double, fields: Seq[String]) extends StatsFunc
  final case class SumLen(fields: Seq[String]) extends StatsFunc
  final case class Values(fields: Seq[String], limit: Option[Long]) extends StatsFunc
  final case class UniqValues(fields: Seq[String], limit: Option[Long]) extends StatsFunc
  final case class JsonValues(fields: Seq[String], limit: Option[Long]) extends StatsFunc
  // row_any(fields...) / row_max(src, fields...) / row_min(src, fields...):
  // the optional field filters (plain names or `p*` prefixes) limit the
  // returned row JSON (stats_row_any.go:170, stats_row_max.go:237; empty =
  // all fields)
  final case class RowAny(fields: Seq[String]) extends StatsFunc
  final case class RowMax(field: String, fields: Seq[String]) extends StatsFunc
  final case class RowMin(field: String, fields: Seq[String]) extends StatsFunc
  /** `stepSec` is the /select/logsql/stats_query_range divisor override
    * (initRateFuncs, pipe_stats.go:298): the range endpoint injects
    * `_time:step` grouping and rates divide by the step, not the query's
    * whole time span. None = derive from the time filter / storage span.
    * Not rendered (the reference's String() omits it too). */
  final case class Rate(stepSec: Option[Double] = None) extends StatsFunc
  final case class RateSum(fields: Seq[String],
                           stepSec: Option[Double] = None) extends StatsFunc
  final case class Histogram(field: String) extends StatsFunc
}

// ---------------------------------------------------------------------------
// Math pipe expression DSL (reference: lib/logstorage/pipe_math.go)
// ---------------------------------------------------------------------------

sealed trait MathExpr

object MathExpr {
  /** `repr` keeps the source token (`10m5s`, `0x1234`, a quoted
    * timestamp) for canonical rendering — the VALUE is resolved at parse
    * like the reference's mathExpr consts (parseMathNumber). */
  final case class Num(v: Double, repr: String = "") extends MathExpr
  final case class FieldRef(name: String) extends MathExpr
  final case class Bin(op: String, l: MathExpr, r: MathExpr) extends MathExpr
  final case class Neg(e: MathExpr) extends MathExpr
  final case class Call(fn: String, args: Seq[MathExpr]) extends MathExpr

  /** Result-field name for a `| math expr` entry WITHOUT an `as` clause:
    * the expression's own rendering (pipe_math.go mathExpr.String() —
    * priorities from mathBinaryOps, lower binds tighter: pow, then
    * mul/div/mod, then add/sub, then and, xor, or, default; a LEFT child
    * parenthesizes when strictly looser, a RIGHT child when
    * equal-or-looser). */
  def render(e: MathExpr): String = {
    def prio(op: String): Int = op match {
      case "^" => 1
      case "*" | "/" | "%" => 2
      case "+" | "-" => 3
      case "&" => 4
      case "xor" => 5
      case "or" | "|" => 6
      case "default" => 10
      case _ => 10
    }
    e match {
      case Num(v, repr) =>
        if (repr.nonEmpty) repr
        else if (v == v.toLong.toDouble) v.toLong.toString else v.toString
      case FieldRef(n) => n
      case Neg(inner) =>
        val s = render(inner)
        inner match {
          case _: Bin => s"-($s)"
          case _ => s"-$s"
        }
      case Bin(op, l, r) =>
        val ls = l match {
          case Bin(lop, _, _) if prio(lop) > prio(op) => s"(${render(l)})"
          case _ => render(l)
        }
        val rs = r match {
          case Bin(rop, _, _) if prio(rop) >= prio(op) => s"(${render(r)})"
          case _ => render(r)
        }
        s"$ls $op $rs"
      case Call(fn, args) => s"$fn(${args.map(render).mkString(", ")})"
    }
  }
}

final case class ParseException(msg: String, pos: Int)
    extends RuntimeException(s"$msg (at offset $pos)")
