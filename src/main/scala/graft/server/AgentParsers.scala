package graft.server

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Spark-free decoders for the agent's remaining ingest transports
  * (loki JSON, OTLP JSON, datadog JSON — the protobuf/binary variants
  * reuse the engine's dependency-free readers directly:
  * [[graft.streaming.LokiProto]], [[graft.streaming.OtlpProto]],
  * [[graft.streaming.JournaldExport]]).
  *
  * Each parser mirrors the engine's Spark-side semantics
  * (streaming/Ingest.scala parseLokiJson/parseOtlpJson/parseDatadogJson,
  * themselves pinned to the reference's app/vlinsert handlers); the
  * LogAgentSpec fidelity cases assert rows shipped through the agent's
  * native-protocol hop match direct engine ingestion field-for-field, so
  * semantic drift between the two implementations fails tests.
  *
  * Decoded row: (tsNanos — 0 means "use ingestion time", msg, fields).
  */
object AgentParsers {

  type Row = (Long, String, Seq[(String, String)])

  private val mapper = new ObjectMapper()

  private def textFields(n: JsonNode): Seq[(String, String)] =
    if (n == null || !n.isObject) Nil
    else n.fields().asScala.map(e => e.getKey -> e.getValue.asText("")).toSeq

  private def lastWins(maps: Seq[(String, String)]*): Seq[(String, String)] = {
    val m = new java.util.LinkedHashMap[String, String]()
    maps.foreach(_.foreach { case (k, v) => m.remove(k); m.put(k, v) })
    m.asScala.toSeq
  }

  /** Loki JSON push body (loki/loki.go JSON branch): streams[] with a
    * `stream` label object and `values` = [ts, line, structured-metadata?]
    * triples. Labels < metadata on key collision (parseLokiJson). */
  def lokiJson(body: Array[Byte]): Seq[Row] = {
    val root = mapper.readTree(body)
    root.path("streams").asScala.toSeq.flatMap { s =>
      val labels = textFields(s.path("stream"))
      s.path("values").asScala.toSeq.map { v =>
        val tsStr = if (v.size() > 0) v.get(0).asText("") else ""
        val ts = Option(graft.functions.GoTime.parseIngestNanos(tsStr))
          .map(_.longValue).getOrElse(0L)
        val line = if (v.size() > 1) v.get(1).asText("") else ""
        val meta = if (v.size() > 2) textFields(v.get(2)) else Nil
        (ts, line, lastWins(labels, meta))
      }
    }
  }

  /** OTLP logs JSON (opentelemetry/opentelemetry.go): resourceLogs →
    * scopeLogs → logRecords; resource attrs < record attrs < severity. */
  def otlpJson(body: Array[Byte]): Seq[Row] = {
    def attrs(n: JsonNode): Seq[(String, String)] =
      n.asScala.toSeq.flatMap { a =>
        val v = a.path("value").path("stringValue")
        if (v.isMissingNode || v.isNull) None
        else Some(a.path("key").asText("") -> v.asText(""))
      }
    val root = mapper.readTree(body)
    for {
      rl <- root.path("resourceLogs").asScala.toSeq
      resAttrs = attrs(rl.path("resource").path("attributes"))
      sl <- rl.path("scopeLogs").asScala.toSeq
      r <- sl.path("logRecords").asScala.toSeq
    } yield {
      val ts = r.path("timeUnixNano").asText("0").toLongOption.getOrElse(0L)
      val msg = r.path("body").path("stringValue").asText("")
      val sev = r.path("severityText").asText("")
      val fields = lastWins(resAttrs, attrs(r.path("attributes")),
        if (sev.nonEmpty) Seq("severity" -> sev) else Nil)
      (ts, msg, fields)
    }
  }

  /** Datadog v2 logs JSON (datadog/datadog.go): array of records, each
    * flattened with the engine's logjson kernel; specials — `message`
    * string or nested `message.message`/`message.status`/
    * `message.lamdba.*` (reference's own key, typo included), `timestamp`
    * millis, `ddtags` "k:v,k2" pairs (value-less → no_label_value). */
  def datadogJson(body: Array[Byte]): Seq[Row] = {
    val root = mapper.readTree(body)
    if (!root.isArray) return Nil
    root.asScala.toSeq.flatMap { rec =>
      val m = Option(graft.functions.JsonFlattenExpr.flatten(
        mapper.writeValueAsString(rec)))
      m.map { mm =>
        def get(k: String): Option[String] = Option(mm.get(k))
        val ts = get("timestamp").flatMap(_.toLongOption).filter(_ > 0)
          .map(_ * 1000000L).getOrElse(0L)
        val msg = get("message.message").orElse(get("message")).getOrElse("")
        val others = mm.asScala.toSeq.filter { case (k, _) =>
          k != "message" && !k.startsWith("message.") &&
          k != "timestamp" && k != "ddtags"
        }
        val status = get("message.status").map("status" -> _).toSeq
        val lambda = mm.asScala.toSeq.collect {
          case (k, v) if k.startsWith("message.lamdba.") => k.substring(15) -> v
        }
        val ddtags = get("ddtags").toSeq.flatMap(_.split(",").toSeq)
          .filter(_.nonEmpty).map { t =>
            val i = t.indexOf(':')
            if (i >= 0) t.take(i) -> t.drop(i + 1)
            else t -> "no_label_value"
          }
        (ts, msg, lastWins(others, status, lambda, ddtags))
      }
    }
  }
}
