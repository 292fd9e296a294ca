package graft.logql

import org.scalatest.funsuite.AnyFunSuite

/** TestParseTimeRange golden bounds (parser_test.go, extracted by
  * tools/extract_timerange_corpus.py): every `_time:<expr>` form must
  * resolve to the reference's exact [minTimestamp, maxTimestamp]
  * nanosecond range. The reference's bounds are INCLUSIVE; the engine's
  * TimeRange carries an exclusive upper bound, so hi == max+1 (with the
  * MaxInt64 sentinel mapping to Long.MaxValue). */
class TimeRangeConformanceSpec extends AnyFunSuite {
  private val NOW = 1700000000000000000L
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("every TestParseTimeRange case resolves to the reference bounds") {
    val in = getClass.getResourceAsStream("/conformance/time_range.txt")
    require(in != null, "missing time_range.txt")
    val bad = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).flatMap { l =>
        val n = mapper.readTree(l)
        val s = n.get("s").asText
        val (mn, mx) = (n.get("min").asLong, n.get("max").asLong)
        try {
          Parser.parse("_time:" + s, NOW).filter match {
            case Filter.TimeRange(lo, hi, _) =>
              val expLo = mn
              val expHi = if (mx == Long.MaxValue) Long.MaxValue else mx + 1
              if (lo == expLo && hi == expHi) None
              else Some(s"<<_time:$s>> got [$lo, $hi) want [$expLo, $expHi)")
            case other => Some(s"<<_time:$s>> parsed to $other")
          }
        } catch {
          case e: Exception => Some(s"<<_time:$s>> !! ${e.getMessage}")
        }
      }.toList
    assert(bad.isEmpty, s"\n${bad.size} time-range mismatches:\n" + bad.mkString("\n"))
  }

  test("GetFilterTimeRange goldens (parser_test.go TestQueryGetFilterTimeRange)") {
    // intersection of top-level _time filters, inclusive ns bounds;
    // day_range does not bound the range
    val goldens = Seq(
      ("*", Long.MinValue, Long.MaxValue),
      ("_time:2024-05-31T10:20:30.456789123Z",
        1717150830456789123L, 1717150830456789123L),
      ("_time:2024-05-31Z", 1717113600000000000L, 1717199999999999999L),
      ("_time:2024-05-31Z _time:day_range[08:00, 16:00]",
        1717113600000000000L, 1717199999999999999L))
    val bad = goldens.flatMap { case (q, lo, hi) =>
      val got = Query.filterTimeRange(Parser.parse(q, NOW))
      if (got == (lo, hi)) None else Some(s"<<$q>> got $got want ($lo, $hi)")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
