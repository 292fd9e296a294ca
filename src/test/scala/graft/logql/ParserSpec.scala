package graft.logql

import org.scalatest.funsuite.AnyFunSuite

class ParserSpec extends AnyFunSuite {
  import Filter._

  private val NOW = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z

  private def parse(s: String): Query = Parser.parse(s, NOW)

  test("bare word is a _msg phrase filter") {
    assert(parse("error").filter == Phrase("_msg", "error"))
  }

  test("quoted phrase") {
    assert(parse("\"foo bar\"").filter == Phrase("_msg", "foo bar"))
  }

  test("field phrase / prefix / exact / exact-prefix") {
    assert(parse("level:error").filter == Phrase("level", "error"))
    assert(parse("level:err*").filter == Prefix("level", "err"))
    assert(parse("level:=error").filter == Exact("level", "error"))
    assert(parse("level:=err*").filter == ExactPrefix("level", "err"))
    assert(parse("level:*").filter == Prefix("level", ""))
  }

  test("implicit and, or, not, parens") {
    val q = parse("error (host:h1 or host:h2) !level:debug")
    q.filter match {
      case And(Seq(Phrase("_msg", "error"), Or(Seq(Phrase("host", "h1"), Phrase("host", "h2"))),
                   Not(Phrase("level", "debug")))) => ()
      case other => fail(s"unexpected: $other")
    }
  }

  test("function filters") {
    assert(parse("level:in(a, b, \"c d\")").filter == In("level", Seq("a", "b", "c d")))
    assert(parse("x:contains_all(a, b)").filter == ContainsAll("x", Seq("a", "b")))
    assert(parse("x:contains_any(a, b)").filter == ContainsAny("x", Seq("a", "b")))
    assert(parse("x:seq(a, b)").filter == Sequence("x", Seq("a", "b")))
    assert(parse("x:re(\"a.*b\")").filter == Regexp("x", "a.*b"))
    assert(parse("x:~\"a.*b\"").filter == Regexp("x", "a.*b"))
    assert(parse("x:i(err)").filter == AnyCasePhrase("x", "err"))
    assert(parse("x:i(err*)").filter == AnyCasePrefix("x", "err"))
    assert(parse("x:string_range(a, b)").filter == StringRange("x", "a", "b", "string_range(a, b)"))
    assert(parse("x:len_range(2, 10)").filter == LenRange("x", 2, 10, "len_range(2, 10)"))
    assert(parse("x:eq_field(y)").filter == EqField("x", "y"))
    assert(parse("x:lt_field(y)").filter == LtField("x", "y"))
  }

  test("range filters") {
    assert(parse("v:>10").filter == Range("v", 10, Double.PositiveInfinity, inclLo = false, inclHi = true, ">10"))
    assert(parse("v:<=5.5").filter == Range("v", Double.NegativeInfinity, 5.5, inclLo = true, inclHi = true, "<=5.5"))
    assert(parse("v:range(1, 10)").filter == Range("v", 1, 10, inclLo = false, inclHi = false, "range(1, 10)"))
    assert(parse("v:range[1, 10)").filter == Range("v", 1, 10, inclLo = true, inclHi = false, "range[1, 10)"))
    assert(parse("v:range[1KiB, 2KiB]").filter == Range("v", 1024, 2048, inclLo = true, inclHi = true, "range[1KiB, 2KiB]"))
  }

  test("ipv4_range") {
    assert(parse("ip:ipv4_range(1.2.3.0, 1.2.3.255)").filter ==
      Ipv4Range("ip", 16909056L, 16909311L))
    assert(parse("ip:ipv4_range(1.2.3.4)").filter == Ipv4Range("ip", 16909060L, 16909060L))
  }

  test("time range absolute") {
    val f = parse("_time:[2024-01-01, 2024-01-02)").filter.asInstanceOf[TimeRange]
    assert(f.loNs == 1704067200L * 1000000000L)
    assert(f.hiNs == 1704153600L * 1000000000L)
  }

  test("time range day precision inclusive") {
    val f = parse("_time:2024-01-01").filter.asInstanceOf[TimeRange]
    assert(f.loNs == 1704067200L * 1000000000L)
    assert(f.hiNs == 1704153600L * 1000000000L)
  }

  test("time relative window") {
    val f = parse("_time:5m").filter.asInstanceOf[TimeRange]
    assert(f.loNs == NOW - 300L * 1000000000L)
  }

  test("day_range and week_range") {
    // bounds are day-offset nanos, ')' folds into -1ns like the reference
    assert(parse("_time:day_range[08:00, 18:00)").filter ==
      DayRange(8L * 3600000000000L, 18L * 3600000000000L - 1,
        0L, "[08:00, 18:00)"))
    assert(parse("_time:week_range[Mon, Fri]").filter ==
      WeekRange(1, 5, 0L, "[Mon, Fri]"))
  }

  test("stream filter") {
    parse("""{app="nginx", env=~"prod.*"}""").filter match {
      case Stream(Seq(Seq(StreamMatcher("app", "=", "nginx"),
                          StreamMatcher("env", "=~", "prod.*")))) => ()
      case other => fail(s"unexpected: $other")
    }
  }

  test("pipes chain") {
    // `| limit 5` merges into the sort (optimizeSortLimitPipes — the
    // lower limit wins); the trailing offset stays separate because the
    // sort already carries a limit
    val q = parse("error | fields a, b | where v:>5 | sort by (a desc) limit 10 | limit 5 | offset 2")
    assert(q.pipes.size == 4)
    assert(q.pipes(0) == Pipe.Fields(Seq("a", "b")))
    assert(q.pipes(2).asInstanceOf[Pipe.Sort].copy(canon = None) == Pipe.Sort(Seq(SortKey("a", desc = true)), Some(5), 0, None, Nil))
    assert(q.pipes(3) == Pipe.Offset(2))
  }

  test("stats pipe with buckets and aliases") {
    val q = parse("* | stats by (level, _time:5m) count() hits, sum(v) as s, count_uniq(u) cu")
    val st = q.pipes.head.asInstanceOf[Pipe.Stats]
    assert(st.by == Seq(ByField("level", None, None), ByField("_time", Some("5m"), None)))
    assert(st.funcs(0) == StatsFuncAs(StatsFunc.Count(Nil), "hits", None))
    assert(st.funcs(1) == StatsFuncAs(StatsFunc.Sum(Seq("v")), "s", None))
    assert(st.funcs(2) == StatsFuncAs(StatsFunc.CountUniq(Seq("u"), None), "cu", None))
  }

  test("stats with if filter") {
    val q = parse("* | stats count() if (level:error) errs")
    val st = q.pipes.head.asInstanceOf[Pipe.Stats]
    assert(st.funcs.head.iff.contains(Phrase("level", "error")))
    assert(st.funcs.head.as == "errs")
  }

  test("top / uniq") {
    assert(parse("* | top 5 by (a, b)").pipes.head == Pipe.Top(5, Seq("a", "b"), "hits", None))
    assert(parse("* | uniq by (a) with hits limit 3").pipes.head ==
      Pipe.Uniq(Seq("a"), withHits = true, Some(3)))
  }

  test("math pipe precedence") {
    val q = parse("* | math a + b * 2 as x")
    val m = q.pipes.head.asInstanceOf[Pipe.Math]
    import MathExpr._
    assert(m.exprs.head._1 == Bin("+", FieldRef("a"), Bin("*", FieldRef("b"), Num(2, "2"))))
  }

  test("format template parses") {
    val q = parse("""* | format "a=<a>, up=<uc:b>!" as out""")
    val f = q.pipes.head.asInstanceOf[Pipe.Format]
    assert(f.parts == Seq(Left("a="), Right(("", "a")), Left(", up="),
      Right(("uc", "b")), Left("!")))
    assert(f.out == "out")
  }

  test("extract pattern steps") {
    val q = parse("""* | extract "ip=<ip> code=<code>" from _msg""")
    val e = q.pipes.head.asInstanceOf[Pipe.Extract]
    assert(e.steps == Seq(PatternStep("ip=", Some("ip")), PatternStep(" code=", Some("code"))))
  }

  test("join and union parse") {
    val q = parse("error | join by (user) (level:info | fields user, name) inner")
    val j = q.pipes.head.asInstanceOf[Pipe.Join]
    assert(j.by == Seq("user") && j.inner)
    assert(j.sub.pipes.size == 1)
    val u = parse("a | union (b)").pipes.head.asInstanceOf[Pipe.Union]
    assert(u.sub.filter == Phrase("_msg", "b"))
  }

  test("first/last desugar to sort") {
    assert(parse("* | first 3 by (x)").pipes.head.asInstanceOf[Pipe.Sort].copy(canon = None) ==
      Pipe.Sort(Seq(SortKey("x", desc = false)), Some(3), 0, None, Nil))
    assert(parse("* | last 3 by (x)").pipes.head.asInstanceOf[Pipe.Sort].copy(canon = None) ==
      Pipe.Sort(Seq(SortKey("x", desc = true)), Some(3), 0, None, Nil))
  }

  test("unpack pipes parse") {
    assert(parse("* | unpack_json from f fields (a, b) result_prefix p_").pipes.head ==
      Pipe.UnpackJson("f", Seq("a", "b"), "p_"))
    assert(parse("* | unpack_logfmt from kv").pipes.head == Pipe.UnpackLogfmt("kv", Nil, ""))
    assert(parse("* | unroll by (arr)").pipes.head == Pipe.Unroll(Seq("arr")))
  }

  test("quantile") {
    val q = parse("* | stats quantile(0.95, v) p95")
    assert(q.pipes.head.asInstanceOf[Pipe.Stats].funcs.head.fn ==
      StatsFunc.Quantile(0.95, Seq("v")))
  }

  test("bare stats pipe shorthand (pipe.go:368-380 default branch)") {
    // `| count()` — the docs' most common form
    val q = parse("* | count()")
    assert(q.pipes.head.asInstanceOf[Pipe.Stats].funcs.head.fn ==
      StatsFunc.Count(Nil))
    // with by-fields and alias
    val q2 = parse("* | by (event_type) avg(event_id) a")
    val st = q2.pipes.head.asInstanceOf[Pipe.Stats]
    assert(st.by.map(_.name) == Seq("event_type"))
    assert(st.funcs.head.fn == StatsFunc.Avg(Seq("event_id")))
    // multiple funcs
    val q3 = parse("* | count() hits, sum(n) s")
    assert(q3.pipes.head.asInstanceOf[Pipe.Stats].funcs.size == 2)
  }

  test("bare filter pipe shorthand") {
    // a field filter after a pipe, no `filter` keyword
    parse("error | limit 10 | event_id:>5").pipes.last match {
      case Pipe.Where(_) => ()
      case other => fail(s"expected Where, got $other")
    }
    // bare words become a filter pipe (reference parsePipeFilter without
    // keyword) which, in FIRST position, merges into the query filter
    // (optimizeNoSubqueries) — NOT an unknown-pipe error
    val bq = parse("* | bogus_pipe x")
    assert(bq.pipes.isEmpty, bq)
    assert(bq.filter == Filter.And(Seq(Phrase("_msg", "bogus_pipe"), Phrase("_msg", "x"))))
    // non-word pipe heads fall through to the filter too
    val pq = parse("* | \"exact phrase\"")
    assert(pq.pipes.isEmpty, pq)
    assert(pq.filter == Phrase("_msg", "exact phrase"))
  }

  test("docs-sweep grammar forms (every LogsQL.md example parses)") {
    // bare fieldless function filters apply to _msg
    assert(parse("seq(\"error\", \"open file\")").filter ==
      Filter.Sequence("_msg", scala.Seq("error", "open file")))
    assert(parse("len_range(5, 10)").filter == Filter.LenRange("_msg", 5, 10, "len_range(5, 10)"))
    parse("contains_all(foo, \"bar baz\")").filter match {
      case Filter.ContainsAll("_msg", vs) => assert(vs == scala.Seq("foo", "bar baz"))
      case other => fail(other.toString)
    }
    // stats by-list without the `by` keyword
    val st = parse("* | stats (host, path) count() c").pipes.head
      .asInstanceOf[Pipe.Stats]
    assert(st.by.map(_.name) == scala.Seq("host", "path"))
    // bare `head` defaults to 10 (pipe_limit.go:107)
    assert(parse("error | head").pipes.head == Pipe.Limit(10))
    assert(parse("error | head 5").pipes.head == Pipe.Limit(5))
    // format/extract_regexp trailing options
    parse("* | format \"x\" as foo keep_original_fields").pipes.head match {
      case f: Pipe.Format => assert(f.keepOriginal && !f.skipEmpty)
      case other => fail(other.toString)
    }
    parse("* | format \"<a><b>\" as foo skip_empty_results").pipes.head match {
      case f: Pipe.Format => assert(f.skipEmpty)
      case other => fail(other.toString)
    }
    parse("* | extract_regexp \"(?P<ip>[0-9]+)\" keep_original_fields").pipes.head match {
      case e: Pipe.ExtractRegexp => assert(e.keepOriginal)
      case other => fail(other.toString)
    }
    // pack fields-list before `as`
    assert(parse("* | pack_json fields (foo, bar) as baz").pipes.head ==
      Pipe.PackJson("baz", scala.Seq("foo", "bar")))
    assert(parse("* | pack_logfmt fields (a) as b").pipes.head ==
      Pipe.PackLogfmt("b", scala.Seq("a")))
    // unpack_words bare source field; json_array_len parens + bare out
    assert(parse("* | unpack_words _msg as words").pipes.head ==
      Pipe.UnpackWords("_msg", "words", 0, false))
    assert(parse("* | json_array_len (words) as n").pipes.head ==
      Pipe.JsonArrayLen("words", "n"))
    assert(parse("* | len(_msg) msglen").pipes.head == Pipe.Len("_msg", "msglen"))
    // math without `as`: the result field is the expression rendering
    val m = parse("* | stats count() logs | math errors / logs").pipes(1)
      .asInstanceOf[Pipe.Math]
    assert(m.exprs.head._2 == "errors / logs", m.exprs.head._2)
    // json_values() with no args = all fields
    val jv = parse("* | stats json_values() as j").pipes.head
      .asInstanceOf[Pipe.Stats].funcs.head.fn
    assert(jv == StatsFunc.JsonValues(scala.Seq("*"), None), jv.toString)
  }

  test("unknown pipe errors when both bare grammars fail") {
    assertThrows[ParseException](parse("* | :"))
    assertThrows[ParseException](parse("* | count(, )"))
  }

  test("stream_context parses before/after/time_window") {
    assert(parse("* | stream_context before 3 after 1").pipes.head ==
      Pipe.StreamContext(3, 1, 3600L * 1000000000L))
    assert(parse("* | stream_context after 2 time_window 5m").pipes.head ==
      Pipe.StreamContext(0, 2, 300L * 1000000000L))
  }

  test("in(subquery) vs in(values)") {
    assert(parse("f:in(a, b)").filter == Filter.In("f", Seq("a", "b")))
    parse("f:in(x:y | fields f)").filter match {
      case Filter.InQuery("f", sub) =>
        assert(sub.pipes == Seq(Pipe.Fields(Seq("f"))))
      case other => fail(s"expected InQuery, got $other")
    }
  }

  test("value_type / blocks_count / block_stats parse") {
    assert(parse("f:value_type(int64)").filter == Filter.ValueType("f", "int64"))
    assert(parse("* | blocks_count as bc").pipes.head == Pipe.BlocksCount("bc"))
    assert(parse("* | block_stats").pipes.head == Pipe.BlockStats)
  }

  test("if (...) options on format/extract/unroll") {
    parse("""* | format if (a:b) "x" as out""").pipes.head match {
      case f: Pipe.Format => assert(f.iff.isDefined && f.out == "out")
      case other => fail(other.toString)
    }
    parse("""* | extract if (a:b) "p<f>" from m""").pipes.head match {
      case e: Pipe.Extract => assert(e.iff.isDefined)
      case other => fail(other.toString)
    }
    parse("* | unroll if (a:b) by (arr)").pipes.head match {
      case u: Pipe.Unroll => assert(u.iff.isDefined && u.fields == Seq("arr"))
      case other => fail(other.toString)
    }
  }

  test("html entities decode in format templates") {
    assert(Parser.parseFormatTemplate("&lt;134&gt;1 <f>") ==
      Seq(Left("<134>1 "), Right(("", "f"))))
  }

  test("number literals") {
    assert(NumLit.parse("5KiB").contains(5 * 1024d))
    assert(NumLit.parse("1h30m").contains(5400d))
    assert(NumLit.parse("-2.5").contains(-2.5))
    assert(NumLit.parse("0x10").contains(16d))
    assert(NumLit.parse("1_000").contains(1000d))
  }

  test("fuzz: garbage input parses or raises ParseException, never crashes") {
    // the HTTP layer maps ParseException to 400 — anything else
    // (StackOverflowError on deep nesting, NPE, MatchError) would 500.
    val rnd = new scala.util.Random(20260813L)
    val atoms = Seq("*", "|", ":", "(", ")", "{", "}", "\"", "'", ",",
      "and", "or", "not", "in", "stats", "by", "count()", "sort", "fields",
      "_time:5m", "error", "foo:bar", "=~", "!=", ">=", "<", "i(", "re(",
      "seq(", "range(", "\\", "\u0000", "日本", " ", "-", "1e9", "0x",
      "extract", "unpack_json", "format", "if", "offset", "limit",
      "\"unterminated", "{a=", "a*b", "..", "$$", "\t", "\n",
      // bare stats/filter pipe shorthand fragments (pipe.go:368-380)
      "by (x)", "avg(y)", "hits", "count() hits", "event_id:>5", "bogus_pipe")
    var parsed = 0
    for (_ <- 1 to 30000) {
      val n = 1 + rnd.nextInt(12)
      val s = Seq.fill(n)(atoms(rnd.nextInt(atoms.length)))
        .mkString(if (rnd.nextBoolean()) " " else "")
      try { Parser.parse(s, NOW); parsed += 1 }
      catch {
        case _: ParseException => ()
        case e: Throwable => fail(s"query <$s> threw ${e.getClass}: $e")
      }
    }
    assert(parsed > 0) // the generator does produce valid queries too
    // deep nesting must not blow the stack (reference caps nesting too)
    val deep = "(" * 10000 + "*" + ")" * 10000
    try Parser.parse(deep, NOW)
    catch { case _: ParseException => () }
    val deepPipes = "* " + ("| where (a:b or c:d) " * 2000)
    try Parser.parse(deepPipes, NOW)
    catch { case _: ParseException => () }
    // pipe-subquery recursion (union/join) bypasses the filter grammar's
    // stack frames and needs its own cap
    val deepUnion = "* " + ("| union (* " * 5000) + (")" * 5000)
    try Parser.parse(deepUnion, NOW)
    catch { case _: ParseException => () }
    val deepIn = ("v:in(* | fields v | where " * 3000) + "*" + (")" * 3000)
    try Parser.parse(deepIn, NOW)
    catch { case _: ParseException => () }
  }

  test("quoted-string hex escapes: valid forms decode, malformed are parse errors") {
    assert(parse("\"a\\u0041b\"").filter == Phrase("_msg", "aAb"))
    assert(parse("\"a\\x41b\"").filter == Phrase("_msg", "aAb"))
    // malformed hex (including sign prefixes parseInt would accept) must
    // be ParseException -> HTTP 400, never NumberFormatException -> 500
    for (bad <- Seq("\"\\uZZ00\"", "\"\\u+12f\"", "\"\\u-abc\"", "\"\\x+f\"",
                    "\"\\xg1\""))
      assertThrows[ParseException](parse(bad))
    // a too-short escape at end of input keeps the backslash literally
    // (the unknown-escape fallback), it does not read off the end
    assert(parse("\"\\u12\"").filter == Phrase("_msg", "\\u12"))
  }

  test("_stream_id: literal, list, and in(subquery) forms") {
    assert(parse("_stream_id:abc123").filter == StreamId(Seq("abc123")))
    assert(parse("_stream_id:in(a1, b2)").filter == StreamId(Seq("a1", "b2")))
    // in(<query>) builds the id set from a subquery
    // (filter_stream_id.go:28-40) and rides the generic InQuery paths
    parse("""_stream_id:in({app="x"} | fields _stream_id)""").filter match {
      case InQuery("_stream_id", sub) =>
        assert(sub.pipes == Seq(Pipe.Fields(Seq("_stream_id"))))
      case other => fail(other.toString)
    }
  }

  test("options inherit into subqueries, overridable per level") {
    val q = parse(
      "options (ignore_global_time_filter=true) * | union (error) " +
      "| join by (v) (options (ignore_global_time_filter=false) level:info)")
    assert(q.options("ignore_global_time_filter") == "true")
    val u = q.pipes.head.asInstanceOf[Pipe.Union]
    assert(u.sub.options("ignore_global_time_filter") == "true") // inherited
    val j = q.pipes(1).asInstanceOf[Pipe.Join]
    assert(j.sub.options("ignore_global_time_filter") == "false") // overridden
  }
}
