package graft.logql

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** TestSyslogParser golden pairs (syslog_parser_test.go, currentYear
  * 2024, UTC zone; extracted by tools/extract_syslog_corpus.py): parse
  * each line through the unpack_syslog kernel and compare the NON-EMPTY
  * field map — the reference marshals exactly the fields it parsed.
  * Deliberate deviations live in the allowlist WITH reasons. */
class SyslogConformanceSpec extends SparkSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** input line -> reason. */
  private val allowlist: Map[String, String] = Map.empty

  test("every TestSyslogParser case matches") {
    val in = getClass.getResourceAsStream("/conformance/syslog_parser.txt")
    require(in != null, "missing syslog_parser.txt")
    val cases = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).map { l =>
        val n = mapper.readTree(l)
        val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
        val it = n.get("out").fields()
        while (it.hasNext) { val e = it.next(); m += e.getKey -> e.getValue.asText }
        // empty values are equivalent to absent fields in this engine's
        // model (same normalization as the pipe-exec corpus)
        (n.get("in").asText, m.toMap.filter(_._2.nonEmpty))
      }.toList.filterNot(c => allowlist.contains(c._1))
    assert(cases.size >= 25, s"corpus shrank: ${cases.size}")

    val schema = StructType(Seq(StructField("_msg", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map(c => Row(c._1)), 2), schema)
    val out = Compiler.applyUnpackSyslog(df, "_msg", "",
      yearOverride = Some(2024))
    val got = out.collect().map { r =>
      val line = r.getAs[String]("_msg")
      val dyn = Option(r.getAs[Map[String, String]]("fields"))
        .getOrElse(Map.empty).filter(_._2.nonEmpty)
      val top = out.schema.fieldNames
        .filter(c => c != "_msg" && c != "fields").flatMap { c =>
          Option(r.getAs[Any](c)).map(_.toString).filter(_.nonEmpty).map(c -> _)
        }.toMap
      line -> (dyn ++ top)
    }.toMap
    val bad = cases.flatMap { case (line, want) =>
      val g = got.getOrElse(line, Map.empty)
      if (g == want) None
      else Some(s"<<$line>>\n  want $want\n  got  $g")
    }
    assert(bad.isEmpty,
      s"\n${bad.size}/${cases.size} syslog mismatches:\n" + bad.mkString("\n"))
  }
}
