package graft.logql

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TestStreamFilterMatchStreamName goldens (stream_filter_test.go:8-163,
  * extracted to conformance/stream_filter_match.txt, 118 cases): every
  * stream filter — including the `in (...)`/`not_in (...)` matchers that
  * desugar to anchored regexes at parse — runs through the full
  * parse→compile path against rows whose `_stream` map carries the
  * golden stream name's labels, and the match verdict must agree. */
class StreamFilterConformanceSpec extends SparkSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private case class C(filter: String, stream: String, want: Boolean)

  private def loadCases(): Seq[C] = {
    val in = getClass.getResourceAsStream("/conformance/stream_filter_match.txt")
    require(in != null, "missing stream_filter_match.txt")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).map { l =>
        val n = mapper.readTree(l)
        C(n.get("filter").asText, n.get("stream").asText,
          n.get("match").asBoolean)
      }.toList
  }

  /** `{a="b",c="d"}` → label map (the golden stream names use only
    * simple Go-quoted `=` tags). */
  private def parseStreamName(s: String): Map[String, String] = {
    val body = s.stripPrefix("{").stripSuffix("}")
    if (body.isEmpty) Map.empty
    else """(\w+)="([^"]*)"""".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  test("every TestStreamFilterMatchStreamName golden matches") {
    val cases = loadCases()
    assert(cases.size >= 118, s"corpus shrank: ${cases.size}")
    // one DataFrame of all distinct stream names; one compiled query per
    // distinct filter (25) instead of one job per case (118)
    val streams = cases.map(_.stream).distinct
    val schema = StructType(Seq(
      StructField("__idx", IntegerType),
      StructField("_stream", MapType(StringType, StringType)),
      StructField("_msg", StringType)))
    val rows = streams.zipWithIndex.map { case (sn, i) =>
      Row(i, parseStreamName(sn), s"row for $sn")
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val idxOf = streams.zipWithIndex.toMap
    val bad = cases.groupBy(_.filter).toSeq.sortBy(_._1).flatMap {
      case (flt, group) =>
        try {
          val got = Compiler.run(df, s"$flt | fields __idx", 0L)
            .collect().map(_.getAs[Any]("__idx").toString.toInt).toSet
          group.flatMap { c =>
            val matched = got.contains(idxOf(c.stream))
            if (matched == c.want) None
            else Some(s"<<$flt>> vs <<${c.stream}>>: got $matched want ${c.want}")
          }
        } catch {
          case e: Exception =>
            Seq(s"<<$flt>> !! ${e.getClass.getSimpleName}: ${
              Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
    }
    assert(bad.isEmpty, s"\n${bad.size}/${cases.size} stream-filter " +
      s"mismatches:\n" + bad.take(30).mkString("\n"))
  }
}
