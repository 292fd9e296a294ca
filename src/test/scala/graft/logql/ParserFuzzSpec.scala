package graft.logql

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Robustness fuzz for the LogsQL parser: any input must either parse or
  * throw ParseException — never hang, stack-overflow, or leak a raw
  * NumberFormatException/IndexOutOfBounds to the HTTP 400 path
  * (QueryServer maps ParseException to a clean 400; anything else would
  * surface as a 500). Inputs are token soup assembled from real LogsQL
  * fragments plus mutation noise, seeded for reproducibility. */
class ParserFuzzSpec extends AnyFunSuite {

  private val NOW = 1704067200L * 1000000000L

  private val fragments = Seq(
    "*", "error", "foo:bar", "_time:5m", "_time:[2024-01-01, 2024-02-01)",
    "{app=\"x\",env=~\"p.*\"}", "_stream_id:abc123", "field:in(a, b, c)",
    "f:in(q | fields f)", "f:contains_all(a, b)", "f:seq(\"a\", \"b\")",
    "_stream_id:in(app:web | fields _stream_id)", "_stream_id:in(a1, b2)",
    "f:~\"re.*\"", "f:>10KiB", "f:<\"zz\"", "f:range(1, 10]",
    "f:ipv4_range(1.2.3.4, 5.6.7.8)", "f:string_range(a, b)",
    "f:len_range(1, 5)", "f:value_type(dict)", "f:eq_field(g)", "i(Foo)",
    "f:i(bar*)", "_time:day_range[08:00, 18:00)", "_time:week_range[Mon, Fri]",
    "|", "| stats count() c", "| stats by (f:10, _time:1h offset -2h) sum(v) s",
    "| sort by (a desc, b) limit 5 offset 2 rank as r partition by (h)",
    "| top 5 by (f) hits as h rank", "| uniq by (a, b) with hits limit 3",
    "| fields a, b*", "| delete c", "| copy a* as b*", "| rename x as y",
    "| extract \"<ip> <verb>\" from _msg keep_original_fields",
    "| extract_regexp \"(?P<x>\\\\d+)\" from f", "| format \"<uc:a>-<q:b>\" as out",
    "| math (a + b) * 2 as y, y default 0 as z", "| replace (\"a\", \"b\") at f",
    "| replace_regexp (\"x+\", \"y\") at f limit 2", "| unpack_json from _msg fields (a*)",
    "| unpack_logfmt from m", "| unpack_syslog from m offset 2h",
    "| unpack_words from t as w drop_duplicates", "| unroll by (w)",
    "| union (error | limit 3)", "| join by (k) (q | stats count() c) prefix p inner",
    "| stream_context before 2 after 1 time_window 1h", "| facets 5 keep_const_fields",
    "| sample 10", "| limit 7", "| offset 3", "| first 2 by (a)", "| last 3 by (b)",
    "| block_stats", "| blocks_count", "| collapse_nums prettify at f",
    "| decolorize f", "| drop_empty_fields", "| field_names as n",
    "| field_values f limit 9", "| hash(f) as h", "| len(f) as l",
    "| json_array_len(f) as n", "| pack_json as p fields (a, b)",
    "| pack_logfmt as p", "| filter x:y", "| where a:>5",
    "options (concurrency=2) error", "AND", "OR", "NOT", "-bar", "!baz",
    "if (a:1)", "(", ")", "\"unterminated", "a:", ":", "''", "|||",
    "\u0000", "🙂", "9999999999999999999999", "1e999", "0x", "-", "f:/24")

  test("random token soup parses or throws ParseException, quickly") {
    val rnd = new Random(20260814L)
    for (i <- 0 until 3000) {
      val n = 1 + rnd.nextInt(8)
      val parts = Seq.fill(n)(fragments(rnd.nextInt(fragments.length)))
      val sep = if (rnd.nextBoolean()) " " else ""
      val input0 = parts.mkString(sep)
      // mutation noise: random splice of a char deletion/insertion
      val input =
        if (input0.nonEmpty && rnd.nextInt(3) == 0) {
          val at = rnd.nextInt(input0.length)
          if (rnd.nextBoolean()) input0.patch(at, "", 1)
          else input0.patch(at, rnd.nextPrintableChar().toString, 0)
        } else input0
      val t0 = System.nanoTime()
      try { Parser.parse(input, NOW); () }
      catch {
        case _: ParseException => ()
        case e: Throwable =>
          fail(s"iteration $i: non-ParseException ${e.getClass.getName}: " +
            s"${e.getMessage} for input <$input>")
      }
      val ms = (System.nanoTime() - t0) / 1e6
      assert(ms < 2000, s"iteration $i: parse took ${ms}ms for input <$input>")
    }
  }
}
