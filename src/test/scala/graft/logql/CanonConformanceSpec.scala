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
}
