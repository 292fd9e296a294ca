package graft.server

import graft.SparkSuite
import graft.logql.Compiler
import graft.store.LogStore
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** End-to-end HTTP ingestion tests: POST protocol payload → store →
  * LogsQL count matches (reference apptest/tests/ingestprotocols_test.go). */
class IngestServerSpec extends SparkSuite {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/ingestsrv_test/$name-${System.nanoTime()}"
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

  // withStaleRetry: the documented client contract for readers racing a
  // background compaction swap (exactly what the force_merge test does)
  private def count(dir: String, q: String): Long =
    LogStore.withStaleRetry(dir) {
      Compiler.run(LogStore.read(spark, dir), q).collect().head.getLong(0)
    }

  test("every /insert protocol round-trips to a queryable store") {
    val dir = tmp("protocols")
    val srv = new IngestServer(spark, dir)
    val port = srv.start()
    try {
      val (c0, _) = post(port, "/insert/jsonline?_stream_fields=app",
        """{"_time":"2024-01-05T10:00:00Z","_msg":"json one","app":"web"}
          |{"_time":"2024-01-05T10:01:00Z","_msg":"json two","app":"web"}""".stripMargin)
      assert(c0 == 200)

      val (c1, bulk) = post(port, "/insert/elasticsearch/_bulk",
        """{"index":{"_index":"logs"}}
          |{"@timestamp":"2024-01-05T11:00:00Z","message":"es doc","app":"api"}""".stripMargin)
      assert(c1 == 200 && bulk.contains("\"errors\":false"))

      val (c2, _) = post(port, "/insert/loki/api/v1/push",
        """{"streams":[{"stream":{"app":"loki"},"values":[["1704451200000000000","loki line"]]}]}""")
      assert(c2 == 204)

      val (c3, _) = post(port, "/insert/opentelemetry/v1/logs",
        """{"resourceLogs":[{"resource":{"attributes":[{"key":"app","value":{"stringValue":"otel"}}]},
          |"scopeLogs":[{"logRecords":[{"timeUnixNano":"1704451200000000000",
          |"severityText":"INFO","body":{"stringValue":"otel line"}}]}]}]}""".stripMargin.replace("\n", ""))
      assert(c3 == 200)

      val (c4, _) = post(port, "/insert/datadog/api/v2/logs",
        """[{"message":"dd line","hostname":"h1","service":"dd","ddtags":"env:prod"}]""")
      assert(c4 == 202)

      val (c5, _) = post(port, "/insert/journald/upload",
        "MESSAGE=journal line\n__REALTIME_TIMESTAMP=1704451200000000\nUNIT=app.service\n")
      assert(c5 == 200)

      assert(count(dir, "json | stats count() c") == 2)
      assert(count(dir, "\"es doc\" | stats count() c") == 1)
      assert(count(dir, "loki | stats count() c") == 1)
      assert(count(dir, "otel | stats count() c") == 1)
      assert(count(dir, "\"dd line\" | stats count() c") == 1)
      assert(count(dir, "journal | stats count() c") == 1)
      assert(count(dir, "* | stats count() c") == 7)
    } finally srv.stop()
  }

  test("_msg_field/_time_field params and VL headers are honored") {
    val dir = tmp("params")
    val srv = new IngestServer(spark, dir)
    val port = srv.start()
    try {
      post(port, "/insert/jsonline?_msg_field=body&_time_field=at",
        """{"at":"2024-01-05T10:00:00Z","body":"custom fields","app":"x"}""")
      post(port, "/insert/jsonline", """{"body":"hdr route","other":"y"}""",
        Map("VL-Msg-Field" -> "body"))
      assert(count(dir, "custom | stats count() c") == 1)
      val t = Compiler.run(LogStore.read(spark, dir), "custom | fields _time")
        .collect().head.getTimestamp(0).toInstant.toString
      assert(t == "2024-01-05T10:00:00Z")
      assert(count(dir, "hdr | stats count() c") == 1)
    } finally srv.stop()
  }

  test("malformed payloads never 500 and never poison later ingest") {
    val dir = tmp("malformed")
    val srv = new IngestServer(spark, dir)
    val port = srv.start()
    def postRaw(path: String, body: Array[Byte],
                headers: Map[String, String]): Int = {
      val conn = new URI(s"http://127.0.0.1:$port$path").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(60000)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.getOutputStream.write(body)
      val c = conn.getResponseCode
      conn.disconnect()
      c
    }
    try {
      val garbage = Array.tabulate[Byte](64)(i => (i * 37 + 11).toByte)
      val cases: Seq[(String, Array[Byte], Map[String, String])] = Seq(
        // binary garbage where protobuf is expected → request-time 400
        ("/insert/loki/api/v1/push", garbage,
          Map("Content-Type" -> "application/x-protobuf")),
        ("/insert/opentelemetry/v1/logs", garbage,
          Map("Content-Type" -> "application/x-protobuf")),
        // corrupt gzip body → decompress error, not a 500
        ("/insert/jsonline", garbage, Map("Content-Encoding" -> "gzip")),
        // structurally-wrong JSON for structured protocols
        ("/insert/loki/api/v1/push", """{"streams":"nope"}""".getBytes(UTF_8),
          Map("Content-Type" -> "application/json")),
        ("/insert/opentelemetry/v1/logs", """{"resourceLogs":42}""".getBytes(UTF_8),
          Map("Content-Type" -> "application/json")),
        ("/insert/datadog/api/v2/logs", "]][[".getBytes(UTF_8), Map.empty))
      for ((path, body, hs) <- cases) {
        val c = postRaw(path, body, hs)
        // lenient line protocols may accept (storing the raw line);
        // binary/structured failures must be client errors — never 5xx
        assert(c < 500, s"$path returned $c")
      }
      // jsonline garbage: an ALL-invalid payload is a client error like
      // the reference (jsonline.go: "errors > 0 && n == errors" -> 400);
      // invalid lines MIXED with valid ones are logged and dropped
      val (cj, _) = post(port, "/insert/jsonline", "not json at all")
      assert(cj == 400)
      val (cmix, _) = post(port, "/insert/jsonline",
        "garbage line\n{\"_time\":\"2024-01-05T10:00:01Z\",\"_msg\":\"mixed ok\"}")
      assert(cmix == 200)
      assert(count(dir, "\"mixed ok\" | stats count() c") == 1)
      assert(count(dir, "\"garbage line\" | stats count() c") == 0)
      // and the server still ingests normally after all of the above
      val (ok, _) = post(port, "/insert/jsonline",
        """{"_time":"2024-01-05T10:00:00Z","_msg":"after the storm"}""")
      assert(ok == 200)
      assert(count(dir, "\"after the storm\" | stats count() c") == 1)
      assert(count(dir, "\"not json at all\" | stats count() c") == 0)
    } finally srv.stop()
  }

  test("loki protobuf+snappy push round-trips") {
    import graft.streaming.LokiProto
    val dir = tmp("lokiproto")
    val srv = new IngestServer(spark, dir)
    val port = srv.start()
    try {
      val body = LokiProto.encodePushRequest(Seq(
        LokiProto.Entry(1704451200123456789L, "proto line one",
          Map("app" -> "web", "env" -> "prod")),
        LokiProto.Entry(1704451201000000000L, "proto line two",
          Map("app" -> "web", "env" -> "prod"))))
      val conn = new URI(s"http://127.0.0.1:$port/insert/loki/api/v1/push")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/x-protobuf")
      conn.getOutputStream.write(body)
      assert(conn.getResponseCode == 204)
      conn.disconnect()
      assert(count(dir, "proto | stats count() c") == 2)
      val fields = Compiler.run(LogStore.read(spark, dir),
        "\"proto line one\" | fields _time")
        .collect().head.getTimestamp(0).toInstant
      // nanosecond input survives at micro precision
      assert(fields.toString == "2024-01-05T10:40:00.123456Z")
      assert(count(dir, "env:prod | stats count() c") == 2)
    } finally srv.stop()
  }

  test("otlp protobuf push round-trips, gzip content-encoding accepted") {
    import graft.streaming.OtlpProto
    val dir = tmp("otlpproto")
    val srv = new IngestServer(spark, dir)
    val port = srv.start()
    try {
      val body = OtlpProto.encodeExportLogs(Seq(
        OtlpProto.Record(1704451200123456789L, "WARN", "otlp proto line",
          Map("service" -> "api"), Map("k" -> "v")),
        OtlpProto.Record(1704451201000000000L, "", "second otlp line",
          Map("service" -> "api"), Map.empty)))
      // gzip the protobuf body and declare it via Content-Encoding
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(body); gz.close()
      val conn = new URI(s"http://127.0.0.1:$port/insert/opentelemetry/v1/logs")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/x-protobuf")
      conn.setRequestProperty("Content-Encoding", "gzip")
      conn.getOutputStream.write(bos.toByteArray)
      assert(conn.getResponseCode == 200)
      conn.disconnect()
      assert(count(dir, "\"otlp proto line\" | stats count() c") == 1)
      assert(count(dir, "service:api | stats count() c") == 2)
      assert(count(dir, "severity:WARN k:v | stats count() c") == 1)
      val t = Compiler.run(LogStore.read(spark, dir),
        "\"otlp proto line\" | fields _time")
        .collect().head.getTimestamp(0).toInstant
      assert(t.toString == "2024-01-05T10:40:00.123456Z")
    } finally srv.stop()
  }

  test("ignore/extra/decolorize ingestion params apply") {
    val dir = tmp("commonparams")
    val srv = new IngestServer(spark, dir)
    val port = srv.start()
    try {
      val esc = "\\u001b" // JSON escape for ESC, decoded by the JSON parser
      post(port,
        "/insert/jsonline?_ignore_fields=secret&_extra_fields=dc=us1&_decolorize_fields=_msg",
        s"""{"_msg":"colored $esc[31mred$esc[0m text","secret":"x","keep":"y"}""")
      val row = Compiler.run(LogStore.read(spark, dir), "* | fields _msg, fields")
        .collect().head
      assert(row.getString(0) == "colored red text")
      val fields = row.getAs[Map[String, String]](1)
      assert(!fields.contains("secret"))
      assert(fields("dc") == "us1" && fields("keep") == "y")
    } finally srv.stop()
  }

  test("far-future timestamps are dropped at ingest") {
    val dir = tmp("future")
    val srv = new IngestServer(spark, dir)
    val port = srv.start()
    try {
      val future = java.time.Instant.now().plus(java.time.Duration.ofDays(30))
      post(port, "/insert/jsonline",
        s"""{"_time":"2024-01-05T10:00:00Z","_msg":"sane row"}
           |{"_time":"$future","_msg":"future row"}""".stripMargin)
      assert(count(dir, "* | stats count() c") == 1)
      assert(count(dir, "sane | stats count() c") == 1)
    } finally srv.stop()
  }

  test("extra_filters and extra_stream_filters scope query API requests") {
    val dir = tmp("extraf")
    val srv = new IngestServer(spark, dir)
    val port = srv.start()
    try {
      post(port, "/insert/jsonline?_stream_fields=app",
        """{"_time":"2024-01-05T10:00:00Z","_msg":"row one","app":"web","lvl":"info"}
          |{"_time":"2024-01-05T10:01:00Z","_msg":"row two","app":"web","lvl":"error"}
          |{"_time":"2024-01-05T10:02:00Z","_msg":"row three","app":"api","lvl":"error"}""".stripMargin)
      val qs = new QueryServer(spark, LogStore.read(spark, dir))
      val qp = qs.start()
      def getQ(args: String): String = {
        val conn = new URI(s"http://127.0.0.1:$qp/select/logsql/query?query=" +
          java.net.URLEncoder.encode("* | stats count() c", UTF_8) + args).toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
        conn.disconnect(); body
      }
      def enc(s: String) = java.net.URLEncoder.encode(s, UTF_8)
      try {
        // JSON shorthand → exact filter on a fields-map entry
        assert(getQ("&extra_filters=" + enc("""{"lvl":"error"}"""))
          .contains("\"c\":\"2\""))
        // multi-value shorthand → in()
        assert(getQ("&extra_filters=" + enc("""{"lvl":["info","error"]}"""))
          .contains("\"c\":\"3\""))
        // raw LogsQL filter string
        assert(getQ("&extra_filters=" + enc("lvl:=info")).contains("\"c\":\"1\""))
        // stream shorthand scopes by stream label
        assert(getQ("&extra_stream_filters=" + enc("""{"app":"api"}"""))
          .contains("\"c\":\"1\""))
      } finally qs.stop()
    } finally srv.stop()
  }

  test("multi-tenant ingest: tenant headers isolate writes and reads") {
    val dir = tmp("tenants")
    val srv = new IngestServer(spark, dir)
    val port = srv.start()
    try {
      post(port, "/insert/jsonline", """{"_msg":"tenant zero row"}""")
      post(port, "/insert/jsonline", """{"_msg":"tenant seven row"}""",
        Map("AccountID" -> "7", "ProjectID" -> "3"))
      // direct store check: both tenants present
      val logs = LogStore.read(spark, dir)
      assert(logs.select("tenant").distinct().collect()
        .map(_.getString(0)).toSet == Set("0:0", "7:3"))
      // query side: headerless defaults to 0:0; headers scope to 7:3
      val qs = new QueryServer(spark, logs)
      val qp = qs.start()
      def getQ(hdrs: Map[String, String]): String = {
        val conn = new URI(s"http://127.0.0.1:$qp/select/logsql/query?query=" +
          java.net.URLEncoder.encode("* | stats count() c", UTF_8)).toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        hdrs.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
        conn.disconnect(); body
      }
      try {
        assert(getQ(Map.empty).contains("\"c\":\"1\""))
        assert(getQ(Map("AccountID" -> "7", "ProjectID" -> "3")).contains("\"c\":\"1\""))
        assert(getQ(Map("AccountID" -> "9")).contains("\"c\":\"0\""))
      } finally qs.stop()
    } finally srv.stop()
  }

  test("query racing a lifecycle file swap retries against the fresh index") {
    val dir = tmp("staleswap")
    val (http, port) = graft.Server.start(spark, dir)
    try {
      for (i <- 1 to 3)
        post(port, "/insert/jsonline?_stream_fields=app",
          s"""{"_time":"2024-01-0${i}T10:00:00Z","_msg":"swap row $i","app":"a$i"}""")
      def getQ(q: String): (Int, String) = {
        val conn = new URI(s"http://127.0.0.1:$port/select/logsql/query?query=" +
          java.net.URLEncoder.encode(q, UTF_8)).toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = if (is == null) "" else new String(is.readAllBytes(), UTF_8)
        conn.disconnect(); (code, body)
      }
      // populate the memoized relation's file index
      assert(getQ("swap | stats count() c")._2.contains("\"c\":\"3\""))
      // swap a file out from under the cached index WITHOUT invalidating —
      // what a compaction/retention rename does between plan and execution
      val victim = spark.read.parquet(s"$dir/logs").inputFiles.head
        .stripPrefix("file:")
      Files.delete(Paths.get(java.net.URLDecoder.decode(victim, UTF_8)))
      // the repeated identical request is a PLAN-CACHE hit: out-of-band
      // file deletion doesn't bump the store generation (in-contract
      // lifecycle swaps invalidate, which does), so the memoized result
      // still answers — by design, and it can't touch the stale index
      assert(getQ("swap | stats count() c")._2.contains("\"c\":\"3\""))
      // a fresh compile (cache-missing request shape) must hit the stale
      // index, invalidate, and retry against the fresh listing — one day
      // partition is gone, the other two rows still answer
      val retriesBefore = Metrics.staleIndexRetries.get
      val (code, body) = getQ("swap app:a* | stats count() c")
      assert(code == 200, s"$code $body")
      assert(body.contains("\"c\":\"2\""), body)
      assert(Metrics.staleIndexRetries.get > retriesBefore)
    } finally http.stop(0)
  }

  test("unified server: ingest then query on one port, fresh data visible") {
    val dir = tmp("unified")
    val (http, port) = graft.Server.start(spark, dir)
    try {
      post(port, "/insert/jsonline?_stream_fields=app",
        """{"_time":"2024-01-05T10:00:00Z","_msg":"unified row","app":"web"}""")
      def getQ(q: String): String = {
        val conn = new URI(s"http://127.0.0.1:$port/select/logsql/query?query=" +
          java.net.URLEncoder.encode(q, UTF_8)).toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
        conn.disconnect(); body
      }
      assert(getQ("unified | stats count() c").contains("\"c\":\"1\""))
      // second ingest on the SAME server is visible without a restart
      post(port, "/insert/jsonline?_stream_fields=app",
        """{"_time":"2024-01-05T11:00:00Z","_msg":"unified again","app":"web"}""")
      assert(getQ("unified | stats count() c").contains("\"c\":\"2\""))
      // /metrics exposes Prometheus text with the ingest/select counters
      val conn = new URI(s"http://127.0.0.1:$port/metrics").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      val metrics = new String(conn.getInputStream.readAllBytes(), UTF_8)
      conn.disconnect()
      def counter(name: String): Long =
        metrics.linesIterator.find(_.startsWith(name + " "))
          .map(_.split(" ")(1).toLong).getOrElse(-1L)
      assert(counter("graft_rows_ingested_total") >= 2)
      assert(counter("graft_ingest_requests_total") >= 2)
      assert(counter("graft_ingest_commits_total") >= 1)
      assert(counter("graft_select_requests_total") >= 2)
      assert(counter("graft_select_rejected_total") >= 0)
      assert(metrics.contains("graft_select_concurrent"))
    } finally http.stop(0)
  }

  test("syslog TCP listener ingests lines") {
    val dir = tmp("syslog")
    val srv = new IngestServer(spark, dir)
    srv.start()
    val sysPort = srv.startSyslogTcp()
    try {
      val sock = new java.net.Socket("127.0.0.1", sysPort)
      val w = new java.io.PrintWriter(sock.getOutputStream)
      w.println("<34>1 2024-01-05T10:11:12Z host1 myapp 77 ID1 - tcp syslog one")
      w.println("<13>Jan  5 10:11:12 host2 cron[123]: tcp syslog two")
      w.flush()
      sock.close()
      // the listener appends on connection EOF; poll briefly
      var tries = 0
      var c = 0L
      while (c < 2 && tries < 50) {
        Thread.sleep(200)
        c = try count(dir, "tcp | stats count() c") catch { case _: Exception => 0L }
        tries += 1
      }
      assert(c == 2)
    } finally srv.stop()
  }

  test("syslog UDP listener ingests datagrams") {
    val dir = tmp("syslogudp")
    val srv = new IngestServer(spark, dir)
    srv.start()
    val udpPort = srv.startSyslogUdp(flushMs = 100L)
    try {
      val sock = new java.net.DatagramSocket()
      def send(s: String): Unit = {
        val b = s.getBytes(UTF_8)
        sock.send(new java.net.DatagramPacket(b, b.length,
          java.net.InetAddress.getByName("127.0.0.1"), udpPort))
      }
      send("<34>1 2024-01-05T10:11:12Z host1 myapp 77 ID1 - udp syslog one")
      send("<13>Jan  5 10:11:12 host2 cron[123]: udp syslog two")
      sock.close()
      var tries = 0
      var c = 0L
      while (c < 2 && tries < 50) {
        Thread.sleep(200)
        c = try count(dir, "udp | stats count() c") catch { case _: Exception => 0L }
        tries += 1
      }
      assert(c == 2)
    } finally srv.stop()
  }

  test("tail delivers same-timestamp rows exactly once across polls") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-05T10:00:00Z"))
    val schema = StructType(Seq(
      StructField("_time", TimestampType), StructField("_msg", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(ts, "same a"), Row(ts, "same b"), Row(ts, "same c"))), schema)
    val qs = new QueryServer(spark, df)
    val port = qs.start()
    try {
      val conn = new URI(s"http://127.0.0.1:$port/select/logsql/tail?query=" +
        java.net.URLEncoder.encode("*", UTF_8) +
        "&max_polls=3&refresh_interval=100").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setReadTimeout(60000)
      val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
      conn.disconnect()
      val lines = body.trim.split("\n").filter(_.nonEmpty)
      // 3 polls over a static source: each row exactly once, not 3×
      assert(lines.length == 3, body)
      assert(lines.toSet.size == 3)
    } finally qs.stop()
  }

  test("debug=1 ingestion is a dry run: accepted but not stored") {
    val dir = tmp("debug")
    val srv = new IngestServer(spark, dir)
    val port = srv.start()
    try {
      val (c, _) = post(port, "/insert/jsonline?_stream_fields=app&debug=1",
        """{"_time":"2024-01-05T10:00:00Z","_msg":"dry run row","app":"web"}""")
      assert(c == 200)
      assert(!Files.exists(Paths.get(s"$dir/logs")))
      // without debug the same payload lands
      post(port, "/insert/jsonline?_stream_fields=app",
        """{"_time":"2024-01-05T10:00:00Z","_msg":"wet run row","app":"web"}""")
      assert(count(dir, "* | stats count() c") == 1)
    } finally srv.stop()
  }

  test("concurrent POSTs group-commit into fewer write jobs than requests") {
    val dir = tmp("groupcommit")
    val srv = new IngestServer(spark, dir)
    val port = srv.start()
    try {
      val nPosts = 24
      val linesPerPost = 50
      val pool = java.util.concurrent.Executors.newFixedThreadPool(12)
      val codes = (0 until nPosts).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            val body = (0 until linesPerPost).map { j =>
              s"""{"_time":"2024-01-05T10:00:${f"${j % 60}%02d"}Z","_msg":"gc line $i-$j","app":"web"}"""
            }.mkString("\n")
            post(port, "/insert/jsonline?_stream_fields=app", body)._1
          }
        })
      }.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      pool.shutdown()
      assert(codes.forall(_ == 200))
      // every row committed before its 200 (read-your-writes preserved)
      assert(count(dir, "gc | stats count() c") == nPosts.toLong * linesPerPost)
      // ...but the writes were coalesced: strictly fewer Spark write jobs
      // than POSTs (the whole point of the group commit)
      assert(srv.committer.enqueued == nPosts)
      assert(srv.committer.flushes < nPosts,
        s"expected coalesced flushes, got ${srv.committer.flushes} for $nPosts posts")
    } finally srv.stop()
  }

  test("/internal/force_merge compacts in background; force_flush returns committed") {
    val dir = tmp("forcemerge")
    val srv = new IngestServer(spark, dir)
    val port = srv.start()
    try {
      // several appends → several small files in the day partition
      (0 until 4).foreach { i =>
        val (c, _) = post(port, "/insert/jsonline?_stream_fields=app",
          s"""{"_time":"2024-01-05T10:0$i:00Z","_msg":"fm row $i","app":"web"}""")
        assert(c == 200)
      }
      val (fc, _) = post(port, "/internal/force_flush", "")
      assert(fc == 200)
      def files(): Int = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
          else Seq(f)
        walk(new java.io.File(s"$dir/logs"))
          .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      }
      val before = files()
      assert(before >= 2)
      // scoped merge: a non-matching prefix must touch nothing
      val (mc0, _) = post(port, "/internal/force_merge?partition_prefix=19990101", "")
      assert(mc0 == 200)
      Thread.sleep(500)
      assert(files() == before)
      // matching prefix compacts the partition in the background
      val (mc, _) = post(port, "/internal/force_merge?partition_prefix=20240105", "")
      assert(mc == 200)
      var tries = 0
      while (files() >= before && tries < 80) { Thread.sleep(250); tries += 1 }
      assert(files() < before, s"force_merge never compacted ($before files)")
      assert(count(dir, "fm | stats count() c") == 4)
    } finally srv.stop()
  }
}
