package graft.logql

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** tryParseDuration / tryParseBytes / marshalDurationString golden
  * tables (values_encoder_test.go, extracted to
  * conformance/duration_bytes.txt, 96 cases). The parsers are
  * case-sensitive exactly like the reference — lowercase duration units,
  * uppercase byte suffixes — with per-group int64 truncation and the
  * MaxInt64 overflow clamp. The duration RENDERER is exercised through
  * the real `format "<duration:f>"` pipe. */
class DurationBytesConformanceSpec extends SparkSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def cases: List[com.fasterxml.jackson.databind.JsonNode] = {
    val in = getClass.getResourceAsStream("/conformance/duration_bytes.txt")
    require(in != null, "missing duration_bytes.txt")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).map(mapper.readTree).toList
  }

  test("every tryParseDuration / tryParseBytes golden matches") {
    val bad = cases.filterNot(_.get("t").asText == "dur_str").flatMap { n =>
      val s = n.get("in").asText
      n.get("t").asText match {
        case "dur_ok" =>
          val want = n.get("out").asText.toLong
          NumLit.durationNanos(s) match {
            case Some(v) if v == want => None
            case other => Some(s"duration <<$s>> got $other want $want")
          }
        case "dur_bad" =>
          NumLit.durationNanos(s) match {
            case None => None
            case some => Some(s"duration <<$s>> should FAIL, got $some")
          }
        case "bytes_ok" =>
          val want = n.get("out").asText.toLong
          NumLit.sizeLong(s) match {
            case Some(v) if v == want => None
            case other => Some(s"bytes <<$s>> got $other want $want")
          }
        case "bytes_bad" =>
          NumLit.sizeLong(s) match {
            case None => None
            case some => Some(s"bytes <<$s>> should FAIL, got $some")
          }
      }
    }
    assert(bad.isEmpty, s"\n${bad.size} duration/bytes mismatches:\n" +
      bad.mkString("\n"))
  }

  test("marshalDurationString goldens match the format pipe's renderer") {
    val ds = cases.filter(_.get("t").asText == "dur_str")
    assert(ds.size >= 8)
    val schema = StructType(Seq(
      StructField("__idx", IntegerType), StructField("f", StringType)))
    val rows = ds.zipWithIndex.map { case (n, i) => Row(i, n.get("in").asText) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = Compiler.run(df,
      """* | format "<duration:f>" as d | fields __idx, d""", 0L)
      .collect().map(r => r.getAs[Any]("__idx").toString.toInt ->
        r.getAs[String]("d")).toMap
    val bad = ds.zipWithIndex.flatMap { case (n, i) =>
      val want = n.get("out").asText
      if (got(i) == want) None
      else Some(s"<<${n.get("in").asText}>> got ${got(i)} want $want")
    }
    assert(bad.isEmpty, s"\n${bad.size} duration-marshal mismatches:\n" +
      bad.mkString("\n"))
  }
}
