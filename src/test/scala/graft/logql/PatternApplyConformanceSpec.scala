package graft.logql

import org.scalatest.funsuite.AnyFunSuite

/** TestPatternApply golden triples (pattern_test.go, extracted by
  * tools/extract_pattern_corpus.py): parse the extract pattern, apply it
  * to the input, compare the NAMED captures in order — a pure-JVM pin of
  * graft.functions.PatternApplyExpr (quote-aware progressive matching).
  */
class PatternApplyConformanceSpec extends AnyFunSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("every TestPatternApply case matches") {
    val in = getClass.getResourceAsStream("/conformance/pattern_apply.txt")
    require(in != null, "missing pattern_apply.txt")
    val bad = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).flatMap { l =>
        val n = mapper.readTree(l)
        val pat = n.get("pat").asText
        val s = n.get("in").asText
        val want = (0 until n.get("out").size).map(n.get("out").get(_).asText)
        try {
          val steps = Parser.parsePatternSteps(pat)
          val all = graft.functions.PatternApplyExpr.apply(
            s, steps.map(st => (st.prefix, st.opt)))
          // named captures only, in step order (pattern.fields)
          val got = steps.zipWithIndex.collect {
            case (st, i) if st.field.exists(_.nonEmpty) => all(i)
          }
          if (got == want) None
          else Some(s"<<$pat>> on <<$s>>: got ${got.mkString("[", "|", "]")} " +
            s"want ${want.mkString("[", "|", "]")}")
        } catch {
          case e: Exception => Some(s"<<$pat>> !! ${e.getMessage}")
        }
      }.toList
    assert(bad.isEmpty, s"\n${bad.size} pattern mismatches:\n" + bad.mkString("\n"))
  }
}
