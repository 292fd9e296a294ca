package graft.store

import graft.logql.Parser
import org.scalatest.funsuite.AnyFunSuite

/** CanReturnLastNResults conformance (reference parser.go:470-500 +
  * the TestQueryCanReturnLastNResults golden table, extracted by
  * tools/extract_tail_corpus.py): the gate deciding whether a
  * `limit=N` query may be served from a newest-days descent instead of
  * a full scan. */
class LastNConformanceSpec extends AnyFunSuite {
  private val NOW = 1700000000000000000L

  /** Entries where this engine is deliberately STRICTER than the
    * reference (got=false where the table says true): a bare
    * unpack_json/unpack_logfmt writes dynamic keys that can overwrite
    * `_time`, and this descent re-sorts by the _time COLUMN after the
    * pipes run — the reference orders by the storage timestamp, which
    * pipes cannot touch. Strictness only ever forces a full scan, never
    * a wrong early answer. */
  private val strictOnly = Set(
    "* | unpack_json x",
    "* | unpack_logfmt x")

  test("every CanReturnLastNResults golden matches (or is stricter-only)") {
    val in = getClass.getResourceAsStream("/conformance/can_return_last_n.txt")
    require(in != null, "missing can_return_last_n.txt")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var strictHits = 0
    val bad = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).flatMap { l =>
        val n = mapper.readTree(l)
        val qs = n.get("q").asText
        val want = n.get("ok").asBoolean
        val got = LogStore.canReturnLastN(Parser.parse(qs, NOW))
        if (got == want) None
        else if (want && !got && strictOnly(qs)) { strictHits += 1; None }
        else Some(s"<<$qs>> got $got want $want")
      }.toList
    assert(bad.isEmpty, s"\n${bad.size} mismatches:\n" + bad.mkString("\n"))
    // the allowlist must stay honest: every entry in it is actually hit
    assert(strictHits == strictOnly.size,
      s"stale strictOnly allowlist: hit $strictHits of ${strictOnly.size}")
  }
}
