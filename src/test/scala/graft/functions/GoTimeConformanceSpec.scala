package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Ingest-timestamp conformance (conformance/timestamp_parse.txt, 43
  * cases):
  *
  *  - TryParseTimestampRFC3339Nano roundtrips (values_encoder_test.go:
  *    151-193): parse → marshal must reproduce the reference's canonical
  *    string, including timezone conversion, SQL space-delimited
  *    datetimes, and 1-9 digit fractions;
  *  - its failure table (:195-241);
  *  - insertutil.ExtractTimestampFromFields (timestamp_test.go): unix
  *    second/milli/micro/nano magnitudes and RFC3339 values produce the
  *    exact nanos, ""/"0"/"-" mean "ingestion time", and malformed or
  *    incomplete values are ERRORS (not silently 'now' — the old
  *    try_cast path dropped unix timestamps to ingestion time).
  */
class GoTimeConformanceSpec extends AnyFunSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("every timestamp golden matches the GoTime ports") {
    val in = getClass.getResourceAsStream("/conformance/timestamp_parse.txt")
    require(in != null, "missing timestamp_parse.txt")
    val cases = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).toList
    assert(cases.size >= 43, s"corpus shrank: ${cases.size}")
    val bad = cases.flatMap { l =>
      val n = mapper.readTree(l)
      val s = n.get("in").asText
      n.get("t").asText match {
        case "rfc_rt" =>
          val want = n.get("out").asText
          val v = GoTime.parseRfc3339Nanos(s)
          if (v == null) Some(s"<<$s>> rfc3339 parse failed")
          else {
            val got = GoTime.formatRfc3339Nanos(v)
            if (got == want) None else Some(s"<<$s>> got $got want $want")
          }
        case "rfc_bad" =>
          if (GoTime.parseRfc3339Nanos(s) == null) None
          else Some(s"<<$s>> should FAIL, parsed ${GoTime.parseRfc3339Nanos(s)}")
        case "ingest_ok" =>
          val want = n.get("out").asText.toLong
          val v = GoTime.parseIngestNanos(s)
          if (v == null) Some(s"<<$s>> ingest parse failed")
          else if (v.longValue() != want) Some(s"<<$s>> got $v want $want")
          else None
        case "ingest_now" =>
          val v = GoTime.parseIngestNanos(s)
          if (v != null && v.longValue() == Long.MinValue) None
          else Some(s"<<$s>> should be the now-sentinel, got $v")
        case "ingest_bad" =>
          if (GoTime.parseIngestNanos(s) == null) None
          else Some(s"<<$s>> should FAIL, got ${GoTime.parseIngestNanos(s)}")
      }
    }
    assert(bad.isEmpty, s"\n${bad.size} timestamp mismatches:\n" +
      bad.mkString("\n"))
  }
}
