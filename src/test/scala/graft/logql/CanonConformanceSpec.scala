package graft.logql

import org.scalatest.funsuite.AnyFunSuite

/** Canonical-rendering conformance: Canon.query(parse(input)) must equal
  * the reference's own Query.String() output for every
  * TestParseQuery_Success pair (src/test/resources/conformance/
  * parser_canonical.txt, extracted by tools/extract_parser_corpus.py).
  *
  * Also pins idempotence: parsing the canonical form and re-rendering it
  * must be a fixed point (the reference test does the same round-trip).
  */
class CanonConformanceSpec extends AnyFunSuite {
  private val NOW = 1700000000000000000L
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** input -> reason. */
  private val allowlist: Map[String, String] = Map(
    "ÿ" -> ("the Go corpus input is the raw invalid-UTF-8 byte 0xFF, " +
      "which strconv.Quote prints as \\xff; JVM strings cannot represent " +
      "that byte distinctly from U+00FF, which Go prints unescaped"))

  private def pairs: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/conformance/parser_canonical.txt")
    require(in != null, "missing parser_canonical.txt")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      .filterNot(_.startsWith("#"))
      .map { l =>
        val a = mapper.readValue(l, classOf[Array[String]])
        (a(0), a(1))
      }
  }

  test("Canon.query matches the reference canonical for every corpus pair") {
    val bad = pairs.filterNot { case (in, _) => allowlist.contains(in) }
      .flatMap { case (in, want) =>
        try {
          val got = Canon.query(Parser.parse(in, NOW))
          if (got != want) Some(s"<<$in>>\n  want <<$want>>\n  got  <<$got>>")
          else None
        } catch {
          case e: Exception => Some(s"<<$in>> !! ${e.getMessage}")
        }
      }
    assert(bad.isEmpty, s"\n${bad.size} canonical mismatches:\n" + bad.mkString("\n"))
  }

  test("AddTimeFilter injection matches the reference canonicals") {
    // TestQuery_AddTimeFilter: AddTimeFilter(2024-12-25T14:56:43Z,
    // 2025-01-13T12:45:34Z) conjoined onto the query and every
    // non-opted-out subquery, rendered canonically
    val start = java.time.Instant.parse("2024-12-25T14:56:43Z")
    val end = java.time.Instant.parse("2025-01-13T12:45:34Z")
    val startNs = start.getEpochSecond * 1000000000L
    val endNs = end.getEpochSecond * 1000000000L
    val in = getClass.getResourceAsStream("/conformance/add_time_filter.txt")
    require(in != null, "missing add_time_filter.txt")
    val bad = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).flatMap { l =>
        val a = mapper.readValue(l, classOf[Array[String]])
        try {
          val got = Canon.query(
            Query.addTimeFilter(Parser.parse(a(0), NOW), startNs, endNs))
          if (got != a(1)) Some(s"<<${a(0)}>>\n  want <<${a(1)}>>\n  got  <<$got>>")
          else None
        } catch { case e: Exception => Some(s"<<${a(0)}>> !! ${e.getMessage}") }
      }.toList
    assert(bad.isEmpty, s"\n${bad.size} injection mismatches:\n" + bad.mkString("\n"))
  }

  test("canonical rendering is a fixed point under re-parse") {
    val bad = pairs.filterNot { case (in, _) => allowlist.contains(in) }
      .flatMap { case (_, want) =>
        try {
          val again = Canon.query(Parser.parse(want, NOW))
          if (again != want) Some(s"<<$want>> re-rendered as <<$again>>")
          else None
        } catch {
          case e: Exception => Some(s"<<$want>> !! ${e.getMessage}")
        }
      }
    assert(bad.isEmpty, s"\n${bad.size} non-fixed-points:\n" + bad.mkString("\n"))
  }

  test("DropAllPipes goldens (parser_test.go TestQueryDropAllPipes)") {
    // pipes cleared; a leading `| filter` survives because Optimize
    // folded it into the query filter at parse, like the reference —
    // the contract the metadata endpoints (facets/field_names/streams)
    // rely on when they drop pipes
    val goldens = Seq(
      "*" -> "*",
      "foo | stats count()" -> "foo",
      "foo or bar and baz | top 5 by (x)" -> "foo or bar baz",
      "foo | filter bar:baz | stats by (x) min(y)" -> "foo bar:baz")
    val bad = goldens.flatMap { case (in, want) =>
      val got = Canon.query(Parser.parse(in, NOW).copy(pipes = Nil))
      if (got == want) None else Some(s"<<$in>> got <<$got>> want <<$want>>")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
