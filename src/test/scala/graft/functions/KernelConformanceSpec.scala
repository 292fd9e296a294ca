package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level goldens from the reference's own tests:
  *
  *  - json_parser_test.go: JsonFlattenExpr must flatten EXACTLY like
  *    ParseLogMessage (field order included; failures → null), except
  *    one documented deviation: explicit JSON nulls read as "" here
  *    (the query-side unpack model) while ingest-side Go skips them —
  *    both render as absent fields.
  *  - tokenizer_test.go: the word tokenizer (graft.functions.Tokens'
  *    static) must produce the same first-seen-ordered, deduped token
  *    stream used by the _msg token bloom and word matching.
  */
class KernelConformanceSpec extends AnyFunSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def lines(name: String): List[String] = {
    val in = getClass.getResourceAsStream(s"/conformance/$name")
    require(in != null, s"missing $name")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).toList
  }

  test("JsonFlatten matches every json_parser_test golden") {
    val bad = lines("json_parser.txt").flatMap { l =>
      val n = mapper.readTree(l)
      val in = n.get("in").asText
      val got = Option(JsonFlattenExpr.flatten(in)).map { m =>
        val it = m.entrySet().iterator()
        val buf = Seq.newBuilder[(String, String)]
        while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
        buf.result()
      }
      if (n.get("out").isNull) {
        if (got.isEmpty) None
        else Some(s"<<$in>> should FAIL, got ${got.get}")
      } else {
        val want = (0 until n.get("out").size).map { i =>
          val f = n.get("out").get(i)
          (f.get(0).asText, f.get(1).asText)
        }
        // deviation: Go SKIPS null JSON values on ingest; this kernel
        // stores "" (equivalent under the missing≡empty field model)
        val gotNorm = got.map(_.filter(_._2.nonEmpty))
        if (gotNorm.contains(want.filter(_._2.nonEmpty))) None
        else Some(s"<<$in>>\n  want $want\n  got  $got")
      }
    }
    assert(bad.isEmpty, s"\n${bad.size} flatten mismatches:\n" + bad.mkString("\n"))
  }

  test("word tokenizer matches every tokenizer_test golden") {
    val bad = lines("tokenizer.txt").flatMap { l =>
      val n = mapper.readTree(l)
      val ins = (0 until n.get("in").size).map(n.get("in").get(_).asText)
      val want = (0 until n.get("out").size).map(n.get("out").get(_).asText)
      // tokenizeStrings: concatenated token streams, first-seen dedup
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      ins.foreach(s => TextMatch.tokenizeString(s).foreach(seen += _))
      val got = seen.toSeq
      if (got == want) None
      else Some(s"<<${ins.mkString("|")}>>\n  want $want\n  got  $got")
    }
    assert(bad.isEmpty, s"\n${bad.size} tokenizer mismatches:\n" + bad.mkString("\n"))
  }

  test("logfmt kernel matches every logfmt_parser_test golden") {
    // parse with the LogfmtToMap kernel, re-render with the CLI's
    // MarshalFieldsToLogfmt analogue (empty name prints as _msg —
    // the kernel already normalizes it)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.MapData
    import org.apache.spark.sql.types.StringType
    val bad = lines("logfmt_parser.txt").flatMap { l =>
      val n = mapper.readTree(l)
      val in = n.get("in").asText
      val want = n.get("out").asText
      val m = LogfmtToMap(Literal.create(in, StringType))
        .eval(null).asInstanceOf[MapData]
      val fields = (0 until m.numElements()).map { i =>
        (m.keyArray().getUTF8String(i).toString,
          m.valueArray().getUTF8String(i).toString)
      }
      val got = graft.CliFormat.fmtLogfmt(fields)
      if (got == want) None else Some(s"<<$in>>\n  want $want\n  got  $got")
    }
    assert(bad.isEmpty, s"\n${bad.size} logfmt mismatches:\n" + bad.mkString("\n"))
  }
}
