package graft.logql

import org.scalatest.funsuite.AnyFunSuite

/** GetStatsByFields / GetStatsByFieldsAddGroupingByTime conformance
  * against the reference's four golden tables
  * (lib/logstorage/parser_test.go:3001-3238, extracted by
  * tools/extract_stats_by_fields_corpus.py). The step_ok entries also
  * pin the REWRITTEN query's canonical text — `_time:<step-ns>` bucket
  * injection and `partition by (_time)` on limited sort/first/last. */
class StatsByFieldsConformanceSpec extends AnyFunSuite {
  private val NOW = 1700000000000000000L
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def goldens = {
    val in = getClass.getResourceAsStream("/conformance/stats_by_fields.txt")
    require(in != null, "missing stats_by_fields.txt")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).map(mapper.readTree).toList
  }

  private def fieldsOf(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] = {
    import scala.jdk.CollectionConverters._
    n.elements().asScala.map(_.asText()).toSeq
  }

  test("GetStatsByFields success goldens") {
    val bad = goldens.filter(_.get("kind").asText == "fields_ok").flatMap { n =>
      val qs = n.get("q").asText
      val want = fieldsOf(n.get("fields"))
      StatsByFields.get(Parser.parse(qs, NOW)) match {
        case Right((by, _)) if by == want => None
        case Right((by, _)) => Some(s"<<$qs>> got $by want $want")
        case Left(e) => Some(s"<<$qs>> unexpected error: $e")
      }
    }
    assert(bad.isEmpty, s"\n${bad.size} mismatches:\n" + bad.mkString("\n"))
  }

  test("GetStatsByFields failure goldens") {
    val bad = goldens.filter(_.get("kind").asText == "fields_err").flatMap { n =>
      val qs = n.get("q").asText
      StatsByFields.get(Parser.parse(qs, NOW)) match {
        case Left(_) => None
        case Right((by, ms)) => Some(s"<<$qs>> should FAIL, got by=$by metrics=$ms")
      }
    }
    assert(bad.isEmpty, s"\n${bad.size} mismatches:\n" + bad.mkString("\n"))
  }

  test("AddGroupingByTime success goldens (fields + rewritten canonical)") {
    val bad = goldens.filter(_.get("kind").asText == "step_ok").flatMap { n =>
      val qs = n.get("q").asText
      val step = n.get("step").asLong
      val want = fieldsOf(n.get("fields"))
      val wantCanon = n.get("canon").asText
      StatsByFields.addGroupingByTime(Parser.parse(qs, NOW), step) match {
        case Right((q2, by, _)) =>
          val gotCanon = Canon.query(q2)
          val errs = Seq(
            if (by == want) None else Some(s"<<$qs>> fields got $by want $want"),
            if (gotCanon == wantCanon) None
            else Some(s"<<$qs>> canon got <<$gotCanon>> want <<$wantCanon>>")
          ).flatten
          errs
        case Left(e) => Seq(s"<<$qs>> unexpected error: $e")
      }
    }
    assert(bad.isEmpty, s"\n${bad.size} mismatches:\n" + bad.mkString("\n"))
  }

  test("AddGroupingByTime failure goldens") {
    val bad = goldens.filter(_.get("kind").asText == "step_err").flatMap { n =>
      val qs = n.get("q").asText
      StatsByFields.addGroupingByTime(Parser.parse(qs, NOW), n.get("step").asLong) match {
        case Left(_) => None
        case Right((_, by, _)) => Some(s"<<$qs>> should FAIL, got $by")
      }
    }
    assert(bad.isEmpty, s"\n${bad.size} mismatches:\n" + bad.mkString("\n"))
  }
}
