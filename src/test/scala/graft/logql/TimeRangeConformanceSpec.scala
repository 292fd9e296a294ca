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
}
