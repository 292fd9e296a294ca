package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import graft.streaming.Ingest

/** HTTP ingestion service (SURVEY §2.4; reference app/vlinsert/main.go:49-85):
  *
  *   - `/insert/jsonline`                  (jsonline/jsonline.go)
  *   - `/insert/elasticsearch/_bulk`       (elasticsearch/elasticsearch.go)
  *   - `/insert/loki/api/v1/push`          (loki/loki.go, JSON)
  *   - `/insert/opentelemetry/v1/logs`     (opentelemetry/opentelemetry.go, JSON)
  *   - `/insert/datadog/api/v2/logs`       (datadog/datadog.go)
  *   - `/insert/journald/upload`           (journald/journald.go)
  *   - `/insert/ready`                     (health probe)
  *   - syslog TCP listener                 (syslog/syslog.go:38-60)
  *
  * Each route feeds the request body through the same protocol parser the
  * streaming file source uses ([[graft.streaming.Ingest]]) and appends the
  * parsed rows into the LogStore layout. Honors the
  * `_stream_fields`/`_msg_field`/`_time_field` args (or `VL-*-Field`
  * headers — insertutil/common_params.go:53-61) and scopes writes to the
  * AccountID/ProjectID tenant (tenant_id.go:15-21, default 0:0).
  */
final class IngestServer(spark: SparkSession, storeDir: String,
                         defaultStreamFields: Seq[String] = Nil,
                         port: Int = 0) {

  @volatile private var serverOpt: Option[HttpServer] = None
  @volatile private var syslogSock: Option[java.net.ServerSocket] = None
  @volatile private var udpSock: Option[java.net.DatagramSocket] = None

  /** Group-commit batcher shared by every HTTP route: concurrent POSTs
    * buffer raw payload lines and coalesce into one parse + one Spark
    * write job per (protocol, params, tenant) group instead of one job
    * each (see [[GroupCommitter]]; reference storage.go:525 shared
    * in-memory part). Handlers still block until their rows are
    * committed, so 200 = queryable. */
  val committer = new GroupCommitter(spark, storeDir)

  /** Mount the insert routes on an externally-owned HttpServer (the
    * unified single-port binary registers ingest + query on one server). */
  def attach(server: HttpServer): Unit = {
    def route(path: String)(
        f: (HttpExchange, Map[String, Seq[String]], Array[Byte]) => Unit): Unit =
      server.createContext(path, new HttpHandler {
        def handle(ex: HttpExchange): Unit = {
          try {
            Metrics.ingestRequests.incrementAndGet()
            val body = decompress(ex, ex.getRequestBody.readAllBytes())
            f(ex, params(ex), body)
          } catch {
            case e: Throwable =>
              val msg = Option(e.getMessage).getOrElse(e.toString)
                .replace("\\", "\\\\").replace("\"", "\\\"")
                .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
              respond(ex, 400, s"""{"error":"$msg"}""")
          } finally ex.close()
        }
      })
    route("/insert/jsonline") { (ex, ps, bytes) =>
      val tf = arg(ex, ps, "_time_field", "VL-Time-Field").getOrElse("_time")
      val mf = arg(ex, ps, "_msg_field", "VL-Msg-Field").getOrElse("_msg")
      val lines = splitLines(new String(bytes, UTF_8))
      // reference jsonline.go: invalid lines among valid ones are logged
      // and dropped, but a payload where NOTHING parses is a client error
      // ("return an error if no logs were processed and there were errors")
      val nonEmpty = lines.filter(_.trim.nonEmpty)
      if (nonEmpty.nonEmpty &&
          !nonEmpty.exists(l => graft.functions.JsonFlattenExpr.flatten(l) != null))
        throw new IllegalArgumentException(
          s"cannot parse any log line in the /insert/jsonline request " +
          s"(${nonEmpty.size} lines, all malformed)")
      append(ex, ps, s"jsonline|$tf|$mf", GroupCommitter.Lines(lines),
        Ingest.parseJsonline(_, tf, mf))
      respond(ex, 200, """{"status":"ok"}""")
    }
    route("/insert/elasticsearch/_bulk") { (ex, ps, bytes) =>
      append(ex, ps, "esbulk",
        GroupCommitter.Lines(splitLines(new String(bytes, UTF_8))),
        Ingest.parseElasticsearchBulk(_))
      // minimal bulk-API response the clients check (elasticsearch.go)
      respond(ex, 200, """{"took":0,"errors":false}""")
    }
    route("/insert/loki/api/v1/push") { (ex, ps, bytes) =>
      // protobuf+snappy is Loki's default transport; JSON is selected by
      // Content-Type (loki.go routes the same way) or, for header-less
      // clients, by the payload's leading '{'
      val ctype = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
      val looksJson = bytes.dropWhile(b => b == ' ' || b == '\n' || b == '\r' || b == '\t')
        .headOption.contains('{'.toByte)
      if (ctype.contains("json") || (!ctype.contains("protobuf") && looksJson))
        // whole bodies batch as one "line" each — the parser explodes them
        append(ex, ps, "lokijson",
          GroupCommitter.Lines(Seq(new String(bytes, UTF_8))), Ingest.parseLokiJson)
      else
        append(ex, ps, "proto", GroupCommitter.Rows(lokiProtoRows(bytes)), identity)
      respondEmpty(ex, 204)
    }
    route("/insert/opentelemetry/v1/logs") { (ex, ps, bytes) =>
      // collectors send protobuf by default; JSON by Content-Type or sniff
      val ctype = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
      val looksJson = bytes.dropWhile(b => b == ' ' || b == '\n' || b == '\r' || b == '\t')
        .headOption.contains('{'.toByte)
      if (ctype.contains("json") || (!ctype.contains("protobuf") && looksJson))
        append(ex, ps, "otlpjson",
          GroupCommitter.Lines(Seq(new String(bytes, UTF_8))), Ingest.parseOtlpJson)
      else
        append(ex, ps, "proto", GroupCommitter.Rows(otlpProtoRows(bytes)), identity)
      respond(ex, 200, "{}")
    }
    route("/insert/datadog/api/v2/logs") { (ex, ps, bytes) =>
      append(ex, ps, "datadog",
        GroupCommitter.Lines(Seq(new String(bytes, UTF_8))), Ingest.parseDatadogJson)
      respond(ex, 202, "{}")
    }
    route("/insert/journald/upload") { (ex, ps, bytes) =>
      // byte-exact Journal Export Format parse (JournaldExport): binary
      // length-prefixed fields may contain newlines and blank lines, so
      // the body must NOT be split on text boundaries
      val rows = graft.streaming.JournaldExport.parse(bytes).map { e =>
        val inst =
          if (e.tsNanos == 0L) java.time.Instant.now()
          else java.time.Instant.ofEpochSecond(
            Math.floorDiv(e.tsNanos, 1000000000L),
            Math.floorMod(e.tsNanos, 1000000000L))
        val msg = e.fields.find(_._1 == "_msg").map(_._2).getOrElse("")
        (java.sql.Timestamp.from(inst), msg,
          e.fields.filter(_._1 != "_msg").toMap)
      }
      append(ex, ps, "journald", GroupCommitter.Rows(rows), identity)
      respondEmpty(ex, 200)
    }
    // cluster-internal native insert (app/vlinsert/internalinsert/
    // internalinsert.go): a reference vlinsert front forwarding rows to
    // this engine as a storage node. Body = concatenated InsertRows
    // (log_rows.go:684), zstd-compressed per Content-Encoding (the
    // shared `decompress` already handles it). Tenant and stream
    // identity are PER ROW here (unlike the public protocols' request
    // args), so rows group by (tenant, tag names) before the committer.
    route("/internal/insert") { (ex, ps, bytes) =>
      val version = ps.get("version").flatMap(_.headOption).getOrElse("")
      if (version != InternalProto.InsertProtocolVersion)
        throw new IllegalArgumentException(
          s"unsupported protocol version=$version; want ${InternalProto.InsertProtocolVersion}")
      val rows = InternalProto.parseInsertRows(bytes)
      rows.groupBy(r => (r.tenant, r.tags.map(_._1).sorted)).foreach {
        case ((tenant, tagNames), group) =>
          val payload = group.map { r =>
            val inst =
              if (r.tsNs == 0L) java.time.Instant.now()
              else java.time.Instant.ofEpochSecond(
                Math.floorDiv(r.tsNs, 1000000000L),
                Math.floorMod(r.tsNs, 1000000000L))
            // an empty field name means _msg on the native protocol, as
            // everywhere else in the reference
            val named = r.fields.map { case (k, v) =>
              (if (k.isEmpty) "_msg" else k) -> v }
            val msg = named.find(_._1 == "_msg").map(_._2).getOrElse("")
            // ListMap: a plain .toMap switches to HashMap above 4 entries
            // and scrambles field order through the native hop — rows
            // shipped by the agent must store fields in the same order
            // direct ingestion would (LogAgentSpec fidelity cases)
            (java.sql.Timestamp.from(inst), msg,
              scala.collection.immutable.ListMap.from(
                named.filter(_._1 != "_msg") ++ r.tags))
          }
          committer.append(GroupCommitter.Rows(payload),
            s"internalinsert|$tenant|tags=${tagNames.mkString(",")}",
            identity, tagNames, tenant)
      }
      respondEmpty(ex, 200)
    }
    route("/insert/ready") { (ex, _, _) => respond(ex, 200, """{"status":"ok"}""") }
    // storage admin endpoints (vlstorage/main.go:211-213): force_merge
    // kicks a scoped compaction in the background and returns immediately;
    // force_flush blocks until everything enqueued is committed+visible
    route("/internal/force_merge") { (ex, ps, _) =>
      val prefix = ps.get("partition_prefix").flatMap(_.headOption)
        .filter(_.nonEmpty)
      Metrics.activeForceMerges.incrementAndGet()
      val t = new Thread(() => {
        try graft.store.Compaction.optimize(spark, storeDir,
          dayPrefix = prefix)
        catch { case e: Throwable =>
          System.err.println(s"[force_merge] failed: ${e.getMessage}") }
        finally Metrics.activeForceMerges.decrementAndGet()
      }, "graft-force-merge")
      t.setDaemon(true)
      t.start()
      respond(ex, 200, "{}")
    }
    route("/internal/force_flush") { (ex, _, _) =>
      val ok = committer.quiesce()
      graft.store.LogStore.invalidateCaches(storeDir)
      if (ok) respond(ex, 200, "{}")
      else respond(ex, 503, """{"error":"flush timed out"}""")
    }
  }

  def start(): Int = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    serverOpt = Some(server)
    attach(server)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    server.getAddress.getPort
  }

  /** Start the syslog TCP listener: lines parse as RFC3164/5424 and append
    * incrementally on a time/size cadence (syslog/syslog.go:38-60 processes
    * lines as the per-conn scanner yields them). Real senders (rsyslog,
    * syslog-ng) hold connections open indefinitely, so waiting for EOF
    * would both delay queryability forever and buffer without bound —
    * connection readers push lines into a shared queue that a flusher
    * drains every `flushMs` (or as soon as `maxPending` lines accumulate),
    * exactly like the UDP path. Returns the bound port. */
  def startSyslogTcp(streamFields: Seq[String] = Seq("hostname"),
                     port: Int = 0, flushMs: Long = 200L,
                     maxPending: Int = 10000): Int = {
    val sock = new java.net.ServerSocket(port, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    syslogSock = Some(sock)
    val pending = new java.util.concurrent.LinkedBlockingQueue[String]()
    val flushLock = new Object
    def flush(): Unit = flushLock.synchronized {
      val batch = new java.util.ArrayList[String]()
      pending.drainTo(batch)
      if (!batch.isEmpty) {
        import scala.jdk.CollectionConverters._
        Ingest.appendBatch(Ingest.parseSyslog(seqDF(batch.asScala.toSeq)),
          storeDir, streamFields)
      }
    }
    val flusher = new Thread(() => {
      while (!sock.isClosed) {
        try Thread.sleep(flushMs) catch { case _: InterruptedException => }
        try flush()
        catch { case e: Throwable =>
          System.err.println(s"[syslog-tcp] flush failed: ${e.getMessage}") }
      }
      try flush() catch { case _: Throwable => } // drain after close
    }, "graft-syslog-flush")
    flusher.setDaemon(true)
    flusher.start()
    val t = new Thread(() => {
      while (!sock.isClosed) {
        try {
          val conn = sock.accept()
          new Thread(() => {
            try {
              // RFC 6587 framing: octet-counted ("48 <165>...") AND
              // newline-delimited frames, like the reference's
              // syslogLineReader (SyslogLineReader port)
              val rd = new graft.streaming.SyslogLineReader(conn.getInputStream)
              while (rd.nextLine()) {
                val line = rd.line
                if (line.nonEmpty) {
                  pending.put(line)
                  if (pending.size >= maxPending) flush()
                }
              }
              rd.error.foreach(e =>
                System.err.println(s"[syslog-tcp] read error: $e"))
            } catch { case _: java.io.IOException => /* sender hung up */ }
            finally conn.close()
          }, "graft-syslog-conn").start()
        } catch { case _: java.net.SocketException => /* closed */ }
      }
    }, "graft-syslog-accept")
    t.setDaemon(true)
    t.start()
    sock.getLocalPort
  }

  /** Start the syslog UDP listener (syslog/syslog.go also serves UDP):
    * datagrams buffer briefly and append in small batches — one write per
    * packet would produce a parquet file per message. Returns the port. */
  def startSyslogUdp(streamFields: Seq[String] = Seq("hostname"),
                     port: Int = 0, flushMs: Long = 200L): Int = {
    val sock = new java.net.DatagramSocket(
      new InetSocketAddress("127.0.0.1", port))
    udpSock = Some(sock)
    val t = new Thread(() => {
      val buf = new Array[Byte](65535)
      val pending = scala.collection.mutable.ArrayBuffer.empty[String]
      var lastFlush = System.nanoTime()
      sock.setSoTimeout(flushMs.toInt)
      while (!sock.isClosed) {
        try {
          val pkt = new java.net.DatagramPacket(buf, buf.length)
          sock.receive(pkt)
          new String(pkt.getData, pkt.getOffset, pkt.getLength, UTF_8)
            .split("\n").foreach(l => if (l.nonEmpty) pending += l)
        } catch {
          case _: java.net.SocketTimeoutException => // flush tick
          case _: java.net.SocketException => // closed
        }
        val now = System.nanoTime()
        if (pending.nonEmpty &&
            (now - lastFlush >= flushMs * 1000000L || pending.size >= 10000)) {
          val batch = pending.toSeq
          pending.clear()
          lastFlush = now
          Ingest.appendBatch(Ingest.parseSyslog(seqDF(batch)),
            storeDir, streamFields)
        }
      }
    }, "graft-syslog-udp")
    t.setDaemon(true)
    t.start()
    sock.getLocalPort
  }

  def stop(): Unit = {
    serverOpt.foreach(_.stop(0))
    syslogSock.foreach(_.close())
    udpSock.foreach(_.close())
    committer.close()
  }

  // ------------------------------------------------------------- plumbing

  private def params(ex: HttpExchange): Map[String, Seq[String]] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("")
      .split("&").toSeq.filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, UTF_8) -> java.net.URLDecoder.decode(v, UTF_8)
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }

  private def arg(ex: HttpExchange, ps: Map[String, Seq[String]],
                  param: String, header: String): Option[String] =
    ps.get(param).flatMap(_.headOption).filter(_.nonEmpty)
      .orElse(Option(ex.getRequestHeaders.getFirst(header)).filter(_.nonEmpty))

  private def tenantOf(ex: HttpExchange): String = {
    val acct = Option(ex.getRequestHeaders.getFirst("AccountID")).getOrElse("0")
    val proj = Option(ex.getRequestHeaders.getFirst("ProjectID")).getOrElse("0")
    QueryServer.canonTenant(s"$acct:$proj")
  }

  /** Transparent request-body decompression by Content-Encoding, matching
    * the reference's protocol readers (gzip / deflate / zstd / snappy). */
  private def decompress(ex: HttpExchange, body: Array[Byte]): Array[Byte] = {
    val enc = Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
      .getOrElse("").toLowerCase
    def readAll(is: java.io.InputStream): Array[Byte] =
      try is.readAllBytes() finally is.close()
    enc match {
      case e if e.contains("gzip") =>
        readAll(new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(body)))
      case e if e.contains("deflate") =>
        readAll(new java.util.zip.InflaterInputStream(
          new java.io.ByteArrayInputStream(body)))
      case e if e.contains("zstd") =>
        readAll(new com.github.luben.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(body)))
      case e if e.contains("snappy") =>
        org.xerial.snappy.Snappy.uncompress(body)
      case _ => body
    }
  }

  /** OTLP protobuf ExportLogsServiceRequest → decoded rows. */
  private def otlpProtoRows(
      bytes: Array[Byte]): Seq[(java.sql.Timestamp, String, Map[String, String])] =
    graft.streaming.OtlpProto.parseExportLogs(bytes).map { r =>
      val fields = r.resAttrs ++ r.attrs ++
        (if (r.severityText.nonEmpty) Map("severity" -> r.severityText) else Map.empty)
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(r.tsNanos, 1000000000L),
        Math.floorMod(r.tsNanos, 1000000000L))),
       r.body, fields)
    }

  /** Loki protobuf PushRequest → decoded rows (driver-side decode; push
    * bodies are bounded, and the reference decodes them in the ingest
    * handler the same way). */
  private def lokiProtoRows(
      bytes: Array[Byte]): Seq[(java.sql.Timestamp, String, Map[String, String])] =
    graft.streaming.LokiProto.parsePushRequest(bytes).map { e =>
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(e.tsNanos, 1000000000L),
        Math.floorMod(e.tsNanos, 1000000000L))),
       e.line, e.labels)
    }

  private def csv(s: String): Seq[String] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty)

  /** Enqueue a payload for group commit. `routeKey` names the protocol
    * parser (+ its params); the remaining common params
    * (insertutil/common_params.go:62-84 — drop fields, add constant
    * fields, strip ANSI from chosen fields) are resolved here and folded
    * into both the batch key and the builder, so payloads merge only when
    * every parse/transform knob matches. */
  private def append(ex: HttpExchange, ps: Map[String, Seq[String]],
                     routeKey: String, payload: GroupCommitter.Payload,
                     parse: DataFrame => DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val streamFields = arg(ex, ps, "_stream_fields", "VL-Stream-Fields")
      .map(csv).getOrElse(defaultStreamFields)
    val ig = arg(ex, ps, "_ignore_fields", "VL-Ignore-Fields").map(csv)
      .getOrElse(Nil)
    val extras = arg(ex, ps, "_extra_fields", "VL-Extra-Fields").map(csv)
      .getOrElse(Nil).flatMap { p =>
        p.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
      }
    val dc = arg(ex, ps, "_decolorize_fields", "VL-Decolorize-Fields").map(csv)
      .getOrElse(Nil)
    // debug=1 is a dry run: entries are logged and DROPPED, not stored
    // (insertutil/common_params.go:245-248)
    if (arg(ex, ps, "debug", "VL-Debug")
        .exists(v => v == "1" || v.equalsIgnoreCase("true"))) {
      val shown: Seq[String] = payload match {
        case GroupCommitter.Lines(ls) => ls
        case GroupCommitter.Rows(rs) => rs.map { case (t, m, f) => s"$t $m $f" }
      }
      shown.foreach(l => System.err.println(
        s"[ingest-debug] ignoring log entry because of `debug` arg: $l"))
      return
    }
    val key = s"$routeKey|ig=${ig.mkString(",")}|xf=${
      extras.map { case (k, v) => s"$k=$v" }.mkString(",")}|dc=${dc.mkString(",")}"
    val build: DataFrame => DataFrame = { in =>
      var df = parse(in)
      if (ig.nonEmpty)
        df = df.withColumn("fields",
          map_filter(col("fields"), (k, _) => !k.isin(ig: _*)))
      if (extras.nonEmpty) {
        val extraMap = map(extras.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
        df = df.withColumn("fields", map_concat(
          map_filter(col("fields"), (k, _) => !k.isin(extras.map(_._1): _*)),
          extraMap))
      }
      applyDecolorize(df, dc)
    }
    committer.append(payload, key, build, streamFields, tenantOf(ex))
  }

  private def applyDecolorize(parsed: DataFrame, dc: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    var df = parsed
    if (dc.nonEmpty) {
      val ansi = "\u001b\\[[0-9;]*m"
      if (dc.contains("_msg"))
        df = df.withColumn("_msg", regexp_replace(col("_msg"), ansi, ""))
      val mapFields = dc.filter(_ != "_msg")
      if (mapFields.nonEmpty)
        df = df.withColumn("fields", transform_values(col("fields"),
          (k, v) => when(k.isin(mapFields: _*), regexp_replace(v, ansi, ""))
            .otherwise(v)))
    }
    df
  }

  private def seqDF(rows: Seq[String]): DataFrame = {
    import spark.implicits._
    rows.toDF("value")
  }

  private def splitLines(body: String): Seq[String] =
    body.split("\n").toSeq.map(_.stripSuffix("\r")).filter(_.nonEmpty)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def respondEmpty(ex: HttpExchange, code: Int): Unit =
    ex.sendResponseHeaders(code, -1)
}
