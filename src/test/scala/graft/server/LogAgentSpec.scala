package graft.server

import graft.SparkSuite
import graft.logql.Compiler
import graft.store.LogStore
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** The shipper half of the cluster story (vlagent, app/vlagent): edge
  * ingest → disk-backed queue → native /internal/insert forward, with
  * at-least-once delivery across storage outages and agent restarts. */
class LogAgentSpec extends SparkSuite {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/agent_test/$name-${System.nanoTime()}"
    Files.createDirectories(Paths.get(d))
    d
  }

  private def post(port: Int, path: String, body: String,
                   headers: Map[String, String] = Map.empty): (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.getOutputStream.write(body.getBytes(UTF_8))
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val out = if (is == null) "" else new String(is.readAllBytes(), UTF_8)
    conn.disconnect()
    (code, out)
  }

  private def count(dir: String, q: String): Long =
    LogStore.withStaleRetry(dir) {
      Compiler.run(LogStore.read(spark, dir), q).collect().head.getLong(0)
    }

  private def await(what: String, timeoutMs: Long = 30000L)(ok: => Boolean): Unit = {
    val t0 = System.currentTimeMillis()
    while (!ok) {
      if (System.currentTimeMillis() - t0 > timeoutMs)
        fail(s"timed out waiting for $what")
      Thread.sleep(100)
    }
  }

  test("agent forwards jsonline and es-bulk to storage over the native protocol") {
    val storeDir = tmp("fwd-store")
    val storage = new IngestServer(spark, storeDir)
    val storagePort = storage.start()
    val agent = new LogAgent(tmp("fwd-queue"),
      Seq(s"http://127.0.0.1:$storagePort"), flushIntervalMs = 50L)
    val agentPort = agent.start()
    try {
      val (c0, _) = post(agentPort,
        "/insert/jsonline?_stream_fields=app",
        """{"_time":"2024-01-05T10:00:00Z","_msg":"agent row one","app":"web","level":"info"}
          |{"_time":"2024-01-05T10:01:00Z","_msg":"agent row two","app":"api"}""".stripMargin)
      assert(c0 == 200)
      val (c1, bulk) = post(agentPort, "/insert/elasticsearch/_bulk?_stream_fields=app",
        """{"index":{"_index":"logs"}}
          |{"@timestamp":"2024-01-05T11:00:00Z","message":"agent es doc","app":"api"}""".stripMargin)
      assert(c1 == 200 && bulk.contains("\"errors\":false"))

      await("rows forwarded")(agent.backlog() == 0 &&
        (try count(storeDir, "agent | stats count() c") == 3L
         catch { case _: Throwable => false }))
      // field/stream fidelity through the native hop
      assert(count(storeDir, """level:info {app="web"} | stats count() c""") == 1)
      assert(count(storeDir, """"agent es doc" {app="api"} | stats count() c""") == 1)
      // timestamps survived (not replaced by ingestion time)
      assert(count(storeDir,
        """_time:[2024-01-05T10:00:00Z, 2024-01-05T11:00:00Z] | stats count() c""") == 3)
    } finally { agent.stop(); storage.stop() }
  }

  test("agent syslog TCP: RFC6587 frames forward with full fidelity") {
    val storeDir = tmp("syslog-store")
    val storage = new IngestServer(spark, storeDir)
    val storagePort = storage.start()
    val agent = new LogAgent(tmp("syslog-queue"),
      Seq(s"http://127.0.0.1:$storagePort"), flushIntervalMs = 50L)
    agent.start()
    val sysPort = agent.startSyslogTcp()
    try {
      val sock = new java.net.Socket("127.0.0.1", sysPort)
      val os = sock.getOutputStream
      // octet-counted frame (RFC 6587 §3.4.1) + newline-delimited frame
      val f1 = "<134>1 2024-01-05T10:00:00Z edge01 payd 77 ID1 - checkout ok"
      os.write(s"${f1.getBytes(UTF_8).length} $f1".getBytes(UTF_8))
      val f2 = "<11>1 2024-01-05T10:01:00Z edge02 payd 78 ID2 - card declined\n"
      os.write(f2.getBytes(UTF_8))
      os.flush(); sock.close()
      await("syslog rows forwarded")(
        try count(storeDir, "app_name:payd | stats count() c") == 2L
        catch { case _: Throwable => false })
      // priority decodes (134 = local0/info, 11 = user/error), hostname
      // became the stream, app_name/proc_id landed as fields, and the
      // frame timestamps survived the native hop
      assert(count(storeDir,
        """level:info {hostname="edge01"} app_name:payd proc_id:77
          | | stats count() c""".stripMargin.replace("\n", "")) == 1)
      assert(count(storeDir,
        """level:error {hostname="edge02"} "card declined"
          | | stats count() c""".stripMargin.replace("\n", "")) == 1)
      assert(count(storeDir,
        "_time:[2024-01-05T10:00:00Z, 2024-01-05T10:01:00Z] | stats count() c") == 2)
    } finally { agent.stop(); storage.stop() }
  }

  /** Differential fidelity: the same payload ingested (a) through the
    * agent's decode → durable queue → native-protocol hop and (b) by the
    * engine's own /insert route must store IDENTICAL rows — streams,
    * fields, timestamps. This pins AgentParsers' jackson decoders to the
    * engine's Spark-side parsers (streaming/Ingest.scala) so the two
    * implementations cannot drift silently. */
  private def fidelityCase(name: String, path: String, body: Array[Byte],
                           headers: Map[String, String],
                           expectRows: Long): Unit = {
    val directDir = tmp(s"$name-direct")
    val agentDir = tmp(s"$name-agent")
    val direct = new IngestServer(spark, directDir)
    val directPort = direct.start()
    val storage = new IngestServer(spark, agentDir)
    val storagePort = storage.start()
    val agent = new LogAgent(tmp(s"$name-queue"),
      Seq(s"http://127.0.0.1:$storagePort"), flushIntervalMs = 50L)
    val agentPort = agent.start()
    def postBytes(port: Int): Int = {
      val conn = new URI(s"http://127.0.0.1:$port$path").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.getOutputStream.write(body)
      val code = conn.getResponseCode
      Option(if (code >= 400) conn.getErrorStream else conn.getInputStream)
        .foreach { is => is.readAllBytes(); is.close() }
      conn.disconnect()
      code
    }
    try {
      assert(postBytes(directPort) < 300, s"$name: direct post failed")
      assert(postBytes(agentPort) < 300, s"$name: agent post failed")
      def dump(dir: String): Seq[String] =
        LogStore.withStaleRetry(dir) {
          Compiler.run(LogStore.read(spark, dir), "* | pack_json p | fields p")
            .collect().map(_.getString(0)).sorted.toSeq
        }
      await(s"$name rows forwarded")(agent.backlog() == 0 &&
        (try dump(agentDir).size.toLong == expectRows
         catch { case _: Throwable => false }))
      val d = dump(directDir)
      assert(d.size.toLong == expectRows, s"$name: direct stored ${d.size}")
      assert(dump(agentDir) == d,
        s"$name rows differ:\nagent : ${dump(agentDir)}\ndirect: $d")
    } finally { agent.stop(); storage.stop(); direct.stop() }
  }

  test("loki JSON through the agent matches direct ingestion") {
    fidelityCase("lokijson", "/insert/loki/api/v1/push?_stream_fields=app",
      """{"streams":[{"stream":{"app":"web","env":"prod"},"values":[
        |["1704451200000000000","loki json line",{"trace_id":"t1"}],
        |["1704451201123456789","second loki line"]]}]}""".stripMargin
        .replace("\n", "").getBytes(UTF_8),
      Map("Content-Type" -> "application/json"), expectRows = 2L)
  }

  test("loki snappy-protobuf through the agent matches direct ingestion") {
    import graft.streaming.LokiProto
    // encodePushRequest output is already snappy-compressed wire format
    val body = (LokiProto.encodePushRequest(Seq(
      LokiProto.Entry(1704451200123456789L, "proto line one",
        Map("app" -> "web", "env" -> "prod")),
      LokiProto.Entry(1704451201000000000L, "proto line two",
        Map("app" -> "web")))))
    fidelityCase("lokiproto", "/insert/loki/api/v1/push?_stream_fields=app",
      body, Map("Content-Type" -> "application/x-protobuf"), expectRows = 2L)
  }

  test("OTLP JSON through the agent matches direct ingestion") {
    fidelityCase("otlpjson", "/insert/opentelemetry/v1/logs?_stream_fields=service",
      """{"resourceLogs":[{"resource":{"attributes":[
        |{"key":"service","value":{"stringValue":"api"}}]},
        |"scopeLogs":[{"logRecords":[
        |{"timeUnixNano":"1704451200123456789","severityText":"WARN",
        |"body":{"stringValue":"otlp json line"},
        |"attributes":[{"key":"k","value":{"stringValue":"v"}}]},
        |{"timeUnixNano":"1704451201000000000",
        |"body":{"stringValue":"second otlp line"}}]}]}]}""".stripMargin
        .replace("\n", "").getBytes(UTF_8),
      Map("Content-Type" -> "application/json"), expectRows = 2L)
  }

  test("OTLP protobuf through the agent matches direct ingestion") {
    import graft.streaming.OtlpProto
    val body = OtlpProto.encodeExportLogs(Seq(
      OtlpProto.Record(1704451200123456789L, "WARN", "otlp proto line",
        Map("service" -> "api"), Map("k" -> "v")),
      OtlpProto.Record(1704451201000000000L, "", "second otlp proto",
        Map("service" -> "api"), Map.empty)))
    fidelityCase("otlpproto", "/insert/opentelemetry/v1/logs?_stream_fields=service",
      body, Map("Content-Type" -> "application/x-protobuf"), expectRows = 2L)
  }

  test("datadog JSON through the agent matches direct ingestion") {
    fidelityCase("datadog", "/insert/datadog/api/v2/logs?_stream_fields=hostname",
      """[{"message":"dd line one","ddsource":"nginx",
        |"ddtags":"env:prod,canary","hostname":"h1","service":"web",
        |"timestamp":1704451200000},
        |{"message":{"message":"dd nested","status":"error",
        |"lamdba":{"arn":"a1"}},"hostname":"h2","timestamp":1704451201000}]"""
        .stripMargin.replace("\n", "").getBytes(UTF_8),
      Map("Content-Type" -> "application/json"), expectRows = 2L)
  }

  test("journald export through the agent matches direct ingestion") {
    val body = ("__REALTIME_TIMESTAMP=1704451200000000\n" +
      "MESSAGE=journal line one\nPRIORITY=6\n_HOSTNAME=h1\n\n" +
      "__REALTIME_TIMESTAMP=1704451201000000\n" +
      "MESSAGE=journal line two\nPRIORITY=3\n_HOSTNAME=h2\n\n").getBytes(UTF_8)
    fidelityCase("journald", "/insert/journald/upload?_stream_fields=_HOSTNAME",
      body, Map.empty, expectRows = 2L)
  }

  test("queue disk usage is bounded: overflow drops the OLDEST blocks") {
    val queueDir = tmp("cap-queue")
    val agent = new LogAgent(queueDir, Seq("http://127.0.0.1:1"),
      flushIntervalMs = 3600000L, // manual flushes only
      maxBackoffMs = 200L, maxQueueBytes = 2048L)
    val agentPort = agent.start()
    try {
      // each flush = one ~1-2KB zstd block (incompressible payload);
      // a 2048B cap holds ~1-2 blocks, so 5 pushes must drop the oldest
      val rnd = new scala.util.Random(7)
      for (i <- 1 to 5) {
        val payload = rnd.alphanumeric.take(2000).mkString
        val (c, _) = post(agentPort, "/insert/jsonline",
          s"""{"_time":"2024-01-05T10:0$i:00Z","_msg":"block $i $payload"}""")
        assert(c == 200)
        agent.flush()
      }
      assert(agent.backlog() <= 2, s"cap did not hold: ${agent.backlog()} blocks")
      // survivors are the NEWEST blocks (highest sequence numbers)
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(Paths.get(queueDir, "q0"))
      val names = try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("block-")).toSeq.sorted finally s.close()
      assert(names.nonEmpty && names.last.contains("5"),
        s"newest block missing from survivors: $names")
    } finally agent.stop()
  }

  test("storage outage queues durably; recovery and agent restart lose nothing") {
    val storeDir = tmp("outage-store")
    val queueDir = tmp("outage-queue")
    // no storage yet: every send fails, blocks pile up on disk
    val agent = new LogAgent(queueDir, Seq("http://127.0.0.1:1"),
      flushIntervalMs = 50L, maxBackoffMs = 100L)
    val agentPort = agent.start()
    val (c0, _) = post(agentPort, "/insert/jsonline?_stream_fields=app",
      """{"_time":"2024-01-05T10:00:00Z","_msg":"queued during outage","app":"web"}""")
    assert(c0 == 200)
    await("block persisted")(agent.backlog() > 0)
    agent.stop() // drains the buffer; queued blocks stay on disk

    // storage comes up; a NEW agent process resumes the same queue dir
    val storage = new IngestServer(spark, storeDir)
    val storagePort = storage.start()
    val agent2 = new LogAgent(queueDir, Seq(s"http://127.0.0.1:$storagePort"),
      flushIntervalMs = 50L, maxBackoffMs = 100L)
    val agent2Port = agent2.start()
    try {
      val (c1, _) = post(agent2Port, "/insert/jsonline?_stream_fields=app",
        """{"_time":"2024-01-05T10:05:00Z","_msg":"sent after recovery","app":"web"}""")
      assert(c1 == 200)
      await("backlog drained")(agent2.backlog() == 0 &&
        (try count(storeDir, "* | stats count() c") == 2L
         catch { case _: Throwable => false }))
      assert(count(storeDir, "queued | stats count() c") == 1)
      assert(count(storeDir, "recovery | stats count() c") == 1)
    } finally { agent2.stop(); storage.stop() }
  }
}
