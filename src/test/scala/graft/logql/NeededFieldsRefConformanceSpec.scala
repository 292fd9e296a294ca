package graft.logql

import org.scalatest.funsuite.AnyFunSuite

/** Runs every expectPipeNeededFields golden table from the reference's
  * lib/logstorage pipe tests (674 cases across 41 pipe test files,
  * conformance/pipe_needed_fields.txt): parse the pipe with the real
  * parser, seed a PrefixFilter with the allow/deny state, run
  * NeededFieldsRef.updatePipe, and compare the resulting filter pair
  * string-for-string. */
class NeededFieldsRefConformanceSpec extends AnyFunSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private case class C(src: String, pipe: String, allow: String,
                       deny: String, allowExp: String, denyExp: String)

  private def loadCases(): Seq[C] = {
    val in = getClass.getResourceAsStream("/conformance/pipe_needed_fields.txt")
    require(in != null, "missing pipe_needed_fields.txt")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).map { l =>
        val n = mapper.readTree(l)
        C(n.get("src").asText, n.get("pipe").asText, n.get("allow").asText,
          n.get("deny").asText, n.get("allow_expected").asText,
          n.get("deny_expected").asText)
      }.toList
  }

  private def split(s: String): Seq[String] =
    if (s.isEmpty) Nil else s.split(",").toSeq

  test("every expectPipeNeededFields golden matches") {
    val cases = loadCases()
    assert(cases.size >= 674, s"corpus shrank: ${cases.size}")
    val bad = cases.flatMap { c =>
      try {
        val q = Parser.parse(s"* | ${c.pipe}", 0L)
        // a leading `filter` pipe (including the bare-filter fallback the
        // reference's parsePipe default branch uses — e.g. its own
        // `collaps_nums` typo case) fuses into the query filter here;
        // reconstruct the pipe the reference analyzed
        val pipe = q.pipes match {
          case Seq(p) => p
          case Seq() => Pipe.Where(q.filter)
          case ps => fail(s"parsed ${ps.size} pipes")
        }
        val pf = new PrefixFilter
        pf.addAllowFilters(split(c.allow))
        pf.addDenyFilters(split(c.deny))
        NeededFieldsRef.updatePipe(pipe, pf)
        val want = (split(c.allowExp).sorted, split(c.denyExp).sorted)
        val got = (pf.getAllowFilters, pf.getDenyFilters)
        if (got == want) None
        else Some(s"${c.src} <<${c.pipe}>> allow=[${c.allow}] deny=[${c.deny}]" +
          s"\n  want allow=${want._1} deny=${want._2}" +
          s"\n  got  allow=${got._1} deny=${got._2}")
      } catch {
        case e: Exception =>
          Some(s"${c.src} <<${c.pipe}>> !! ${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    assert(bad.isEmpty,
      s"\n${bad.size}/${cases.size} needed-fields mismatches:\n" +
        bad.take(50).mkString("\n"))
  }
}
