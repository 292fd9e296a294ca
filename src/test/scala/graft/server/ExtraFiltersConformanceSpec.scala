package graft.server

import graft.logql.{Canon, Filter}
import org.scalatest.funsuite.AnyFunSuite

/** parseExtraFilters / parseExtraStreamFilters goldens
  * (app/vlselect/logsql/logsql_test.go, extracted by
  * tools/extract_kernel_corpus.py): the `extra_filters` /
  * `extra_stream_filters` HTTP args — JSON shorthand or raw LogsQL —
  * must canonicalize exactly like the reference, and the malformed
  * inputs (non-string JSON values, pipes) must error. */
class ExtraFiltersConformanceSpec extends AnyFunSuite {
  private val NOW = 1700000000000000000L
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("every parseExtraFilters golden matches") {
    val in = getClass.getResourceAsStream("/conformance/extra_filters.txt")
    require(in != null, "missing extra_filters.txt")
    val bad = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).flatMap { l =>
        val n = mapper.readTree(l)
        val s = n.get("in").asText
        val stream = n.get("stream").asBoolean
        val tag = if (stream) "stream" else "plain"
        if (n.get("out").isNull) {
          try {
            QueryServer.extraFilter(s, stream, NOW)
            Some(s"[$tag] <<$s>> should FAIL")
          } catch { case _: Exception => None }
        } else {
          val want = n.get("out").asText
          try {
            val f = QueryServer.extraFilter(s, stream, NOW)
            val got = f match {
              case Filter.Noop if want.isEmpty => ""
              case other => Canon.filter(other)
            }
            if (got == want) None
            else Some(s"[$tag] <<$s>> got <<$got>> want <<$want>>")
          } catch {
            case e: Exception => Some(s"[$tag] <<$s>> !! ${e.getMessage}")
          }
        }
      }.toList
    assert(bad.isEmpty, s"\n${bad.size} extra-filter mismatches:\n" + bad.mkString("\n"))
  }
}
