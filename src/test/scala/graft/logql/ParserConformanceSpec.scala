package graft.logql

import org.scalatest.funsuite.AnyFunSuite

/** Conformance against the reference's own parser test corpus
  * (parser_test.go TestParseQuery_Success / TestParseQuery_Failure,
  * extracted verbatim by tools/extract_parser_corpus.py into
  * src/test/resources/conformance/). Both directions must be total: a
  * query the reference accepts parses here, a query it rejects errors
  * here. Any deliberate deviation must be added to the allowlists below
  * WITH a reason — as of round 9 both lists are empty.
  */
class ParserConformanceSpec extends AnyFunSuite {
  private val NOW = 1700000000000000000L
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // name -> reason; keys are exact corpus lines
  private val acceptAllowlist: Map[String, String] = Map.empty
  private val rejectAllowlist: Map[String, String] = Map.empty

  private def load(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/conformance/$name")
    require(in != null, s"missing corpus resource $name")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      .filterNot(_.startsWith("#"))
      .map(l => mapper.readValue(l, classOf[String]))
  }

  test("every TestParseQuery_Success input parses") {
    val bad = load("parser_success.txt").filterNot(acceptAllowlist.contains)
      .flatMap { q =>
        try { Parser.parse(q, NOW); None }
        catch { case e: Exception => Some(s"<<$q>> -- ${e.getMessage}") }
      }
    assert(bad.isEmpty, s"\n${bad.size} should-parse rejected:\n" + bad.mkString("\n"))
  }

  test("every TestParseQuery_Failure input is rejected") {
    val bad = load("parser_failure.txt").filterNot(rejectAllowlist.contains)
      .flatMap { q =>
        try { Parser.parse(q, NOW); Some(s"<<$q>>") }
        catch { case _: Exception => None }
      }
    assert(bad.isEmpty, s"\n${bad.size} should-reject accepted:\n" + bad.mkString("\n"))
  }
}
