package graft.tools

import graft.SparkSuite
import graft.server.IngestServer
import org.apache.spark.sql.functions._

/** The load generator must produce the reference vlogsgenerator's line
  * shape (field-type mix, dict vocabulary, stream churn) and round-trip
  * through the ingest server. */
class LogsGenSpec extends SparkSuite {

  test("every generated line is valid JSON with the flagged field mix") {
    val cfg = LogsGen.Config(activeStreams = 4, totalStreams = 0,
      logsPerStream = 5, workers = 2, constF = 2, varF = 1, dictF = 2,
      u8F = 1, u16F = 1, u32F = 1, u64F = 1, i64F = 1, floatF = 1,
      ipF = 1, timestampF = 1, jsonF = 1)
    val rows = LogsGen.lines(spark, cfg).collect().map(_.getString(0))
    // the reference's generator loop runs strictly before `end`
    // (main.go:225-230): step = span/(logsPerStream-1), so an evenly
    // dividing span yields logsPerStream-1 timestamps — 4 here
    assert(rows.length == 2 * 4 * 4, s"got ${rows.length} lines")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    rows.foreach { line =>
      val node = mapper.readTree(line) // throws on malformed JSON
      for (f <- Seq("_time", "_msg", "host", "worker_id", "run_id",
                    "const_0", "const_1", "var_0", "dict_0", "dict_1",
                    "u8_0", "u16_0", "u32_0", "u64_0", "i64_0",
                    "float_0", "ip_0", "timestamp_0", "json_0"))
        assert(node.has(f), s"missing $f in $line")
      assert(node.size() == 19, s"unexpected field count in $line")
      // typed value shapes
      assert(node.get("u8_0").asText().toInt < 256)
      assert(node.get("u16_0").asText().toInt < 65536)
      assert(node.get("u32_0").asText().toLong < 4294967296L)
      assert(BigInt(node.get("u64_0").asText()) >= 0) // unsigned decimal
      assert(node.get("ip_0").asText()
        .matches("""\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"""))
      assert(Set("debug", "info", "warn", "error", "fatal",
        "ERROR", "FATAL", "INFO")(node.get("dict_0").asText()))
      assert(node.get("float_0").asText().toDouble <= 10.001)
      // the json_* payload is the reference's verbatim pseudo-JSON string
      assert(node.get("json_0").asText().contains("\"f3\":NaN"))
      assert(node.get("_msg").asText().startsWith("message for the stream "))
    }
    // determinism: same flags → byte-identical corpus
    val again = LogsGen.lines(spark, cfg).collect().map(_.getString(0))
    assert(rows.toSeq == again.toSeq)
  }

  test("stream churn substitutes streams across the range; ingest round-trips") {
    // totalStreams > activeStreams: hosts beyond the first window must
    // appear as time advances (main.go:219-231 churn model)
    val cfg = LogsGen.Config(activeStreams = 3, totalStreams = 9,
      logsPerStream = 6, workers = 1, constF = 0, varF = 0, dictF = 1,
      u8F = 0, u16F = 0, u32F = 0, u64F = 0, i64F = 0, floatF = 0,
      ipF = 0, timestampF = 0, jsonF = 0)
    val df = LogsGen.lines(spark, cfg)
    val hosts = df.select(
        regexp_extract(col("line"), """"host":"(host_\d+)"""", 1).as("h"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(hosts.size > cfg.activeStreams,
      s"no churn: only ${hosts.size} hosts $hosts")

    val dir = java.nio.file.Files.createTempDirectory("logsgen").toString
    val srv = new IngestServer(spark, dir)
    val port = srv.start()
    try {
      val lines = df.collect().map(_.getString(0))
      val url = new java.net.URL(
        s"http://localhost:$port/insert/jsonline?_stream_fields=host,worker_id")
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      val os = conn.getOutputStream
      os.write(lines.mkString("", "\n", "\n").getBytes("UTF-8")); os.close()
      assert(conn.getResponseCode == 200) // 200 = committed (read-your-writes)
      val stored = graft.store.LogStore.read(spark, dir)
      assert(stored.count() == lines.length)
      // stream identity came through: one _stream_id per generated host
      assert(stored.select("_stream_id").distinct().count() == hosts.size)
    } finally srv.stop()
  }
}
