package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-protocol golden tables from the reference's own
  * app/vlinsert tests (conformance/ingest_protocols.txt, 18 cases):
  * each payload runs through the real parse* transform and the parsed
  * (timestamp, fields) rows must match the reference's expected rows —
  * jsonline/elasticsearch field fallback lists and dropped invalid
  * lines, loki structured metadata + fractional/scientific unix
  * timestamps, datadog tag splitting.
  *
  * Timestamps compare at MICROsecond precision (the store's _time
  * resolution — documented deviation from the reference's nanos). */
class IngestProtocolConformanceSpec extends SparkSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private case class C(proto: String, in: String, timeField: String,
                       msgField: String, ts: Seq[Long],
                       rows: Seq[Map[String, String]], nrows: Int)

  private def loadCases(): Seq[C] = {
    val in = getClass.getResourceAsStream("/conformance/ingest_protocols.txt")
    require(in != null, "missing ingest_protocols.txt")
    import scala.jdk.CollectionConverters._
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).map { l =>
        val n = mapper.readTree(l)
        val rows = (0 until n.get("rows").size).map { i =>
          mapper.readTree(n.get("rows").get(i).asText).fields().asScala
            .map(e => e.getKey -> e.getValue.asText).toMap
        }
        C(n.get("proto").asText, n.get("in").asText,
          Option(n.get("time_field")).map(_.asText).getOrElse(""),
          Option(n.get("msg_field")).map(_.asText).getOrElse(""),
          (0 until Option(n.get("ts")).map(_.size).getOrElse(0))
            .map(n.get("ts").get(_).asLong),
          rows,
          Option(n.get("nrows")).map(_.asInt).getOrElse(-1))
      }.toList
  }

  private def linesDf(s: String): DataFrame = {
    import spark.implicits._
    s.split("\n", -1).toSeq.toDF("value")
  }

  private def wholeDf(s: String): DataFrame = {
    import spark.implicits._
    Seq(s).toDF("value")
  }

  /** Parsed row → (micros, fields+msg map with empties dropped). */
  private def collectRows(df: DataFrame): Seq[(Long, Map[String, String])] =
    df.select(unix_micros(col("_time")).as("__us"), col("_msg"), col("fields"))
      .collect().toSeq.map { r =>
        val fields = r.getAs[Map[String, String]]("fields")
          .filter(_._2.nonEmpty)
        val msg = r.getAs[String]("_msg")
        (r.getLong(0),
          if (msg == null || msg.isEmpty) fields else fields + ("_msg" -> msg))
      }

  test("every app/vlinsert protocol golden parses identically") {
    val cases = loadCases()
    assert(cases.size >= 30, s"corpus shrank: ${cases.size}")
    val bad = cases.zipWithIndex.flatMap { case (c, ci) =>
      try {
        if (c.proto == "journald") {
          // byte-level parser, nanosecond-exact (no store truncation)
          val entries = JournaldExport.parse(
            c.in.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val got = entries.map(e =>
            (e.tsNanos, e.fields.toMap.filter(_._2.nonEmpty)))
          val want = c.ts.zip(c.rows.map(_.filter(_._2.nonEmpty)))
          if (got.map(_._1) != c.ts)
            Some(s"[$ci journald] ts got ${got.map(_._1)} want ${c.ts}")
          else if (got.map(_._2) != want.map(_._2))
            Some(s"[$ci journald] fields\n  got  ${got.map(_._2)}" +
              s"\n  want ${want.map(_._2)}")
          else None
        } else {
        val parsed = c.proto match {
          case "jsonline" => Ingest.parseJsonlineMulti(linesDf(c.in),
            Ingest.splitFields(c.timeField), Ingest.splitFields(c.msgField))
          case "elasticsearch" => Ingest.parseElasticsearchBulk(
            linesDf(c.in),
            s"non_existing_foo,${c.timeField},non_existing_bar",
            s"non_existing_foo,${c.msgField},non_exiting_bar")
          case "loki_json" => Ingest.parseLokiJson(wholeDf(c.in))
          case "datadog" => Ingest.parseDatadogJson(wholeDf(c.in))
        }
        val got = collectRows(parsed)
        val wantN = if (c.nrows >= 0) c.nrows else c.rows.size
        if (got.size != wantN)
          Some(s"[$ci ${c.proto}] got ${got.size} rows want $wantN:" +
            s"\n  got ${got.take(4).mkString("; ")}")
        else {
          // timestamps at micros; datadog rows use ingestion time (skip)
          val tsBad =
            if (c.ts.isEmpty) None
            else {
              val want = c.ts.map(_ / 1000L).sorted
              val gotTs = got.map(_._1).sorted
              if (gotTs == want) None
              else Some(s"[$ci ${c.proto}] ts got $gotTs want $want")
            }
          val fieldsBad = {
            val want = c.rows.map(_.filter(_._2.nonEmpty))
              .sortBy(_.toSeq.sorted.mkString(""))
            val gotF = got.map(_._2).sortBy(_.toSeq.sorted.mkString(""))
            if (gotF == want) None
            else Some(s"[$ci ${c.proto}] fields\n  got  $gotF\n  want $want")
          }
          tsBad.orElse(fieldsBad)
        }
        }
      } catch {
        case e: Exception =>
          Some(s"[$ci ${c.proto}] !! ${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    assert(bad.isEmpty, s"\n${bad.size}/${cases.size} protocol mismatches:\n" +
      bad.mkString("\n"))
  }

  test("journald field-name validation goldens (TestIsValidFieldName)") {
    val cases = Seq("" -> false, "a" -> false, "1" -> false, "_" -> true,
      "X" -> true, "Xa" -> false, "X_343" -> true,
      "X_0123456789_AZ" -> true, "SDDFD sdf" -> false)
    cases.foreach { case (n, want) =>
      assert(JournaldExport.isValidFieldName(n) == want, s"<<$n>>")
    }
  }
}
