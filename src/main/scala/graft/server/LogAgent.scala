package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** vlagent analogue (app/vlagent/main.go + remotewrite/): a log shipper
  * that accepts ingest protocols at the edge and forwards rows to remote
  * storage over the cluster-internal native protocol, surviving remote
  * outages with a disk-backed pending queue.
  *
  * Deliberately SPARK-FREE: a shipper runs on edge boxes where a JVM
  * with an executor pool is exactly what you don't want. Rows parse with
  * the same driver-usable kernels the engine uses (JsonFlattenExpr,
  * GoTime ingest timestamps), marshal into InsertRow blocks
  * (InternalProto), and land in a per-remote persistent queue
  * (remotewrite/pendinglogrows.go + lib/persistentqueue): one file per
  * block, lowest-sequence-first senders, exponential backoff on failure,
  * delete on 2xx. A request is ACKed once its rows are buffered (the
  * reference acks after MustAddRows into the queue, not after the remote
  * commit), so storage downtime never back-pressures the edge.
  *
  * Protocol scope (vlagent fronts every insert protocol,
  * app/vlagent/main.go): /insert/jsonline, /insert/elasticsearch/_bulk,
  * /insert/loki/api/v1/push (JSON + snappy-protobuf),
  * /insert/opentelemetry/v1/logs (JSON + protobuf),
  * /insert/datadog/api/v2/logs, /insert/journald/upload, and a syslog
  * TCP listener (RFC 6587 octet-counted + newline framing via the
  * engine's SyslogLineReader, RFC 3164/5424 parsing via SyslogParse).
  * Binary payloads decode with the engine's own dependency-free readers;
  * JSON payloads with [[AgentParsers]], whose semantics the
  * LogAgentSpec fidelity cases pin against direct engine ingestion.
  */
final class LogAgent(queueDir: String, remoteUrls: Seq[String],
                     port: Int = 0,
                     flushIntervalMs: Long = 200L,
                     maxBlockRows: Int = 10000,
                     maxBackoffMs: Long = 2000L,
                     maxQueueBytes: Long = 1L << 30) {
  import InternalProto._

  @volatile private var stopped = false
  @volatile private var serverOpt: Option[HttpServer] = None

  // ------------------------------------------------------ pending buffer

  private val pending = new java.util.ArrayList[InsertRow]()

  private def enqueueRows(rows: Seq[InsertRow]): Unit = pending.synchronized {
    rows.foreach(pending.add)
    if (pending.size >= maxBlockRows) flushLocked()
  }

  /** Marshal the buffered rows into one block file per remote queue.
    * Written temp-then-rename so senders never see a partial block. */
  private def flushLocked(): Unit = {
    if (pending.isEmpty) return
    val out = new ByteArrayOutputStream()
    pending.forEach(r => marshalInsertRow(out, r))
    pending.clear()
    val block = zstdCompress(out.toByteArray)
    queues.foreach(_.push(block))
  }

  def flush(): Unit = pending.synchronized { flushLocked() }

  private val flusher = new Thread(() => {
    while (!stopped) {
      try Thread.sleep(flushIntervalMs)
      catch { case _: InterruptedException => () }
      try flush()
      catch { case e: Throwable =>
        System.err.println(s"[agent] flush failed: $e") }
    }
  }, "graft-agent-flusher")
  flusher.setDaemon(true)

  // --------------------------------------------------- persistent queues

  /** One durable queue + sender per remote URL
    * (remotewrite.initRemoteWriteCtxs). Block files are named by a
    * monotonically increasing sequence; recovery = list + resume from
    * the lowest (dangling blocks from a previous run are re-sent —
    * at-least-once, like the reference's persistent queue). */
  private final class RemoteQueue(idx: Int, url: String) {
    private val dir: Path = Paths.get(queueDir, s"q$idx")
    Files.createDirectories(dir)
    private val seq = new java.util.concurrent.atomic.AtomicLong(
      listBlocks().lastOption.map(blockSeq).getOrElse(0L))

    private def blockSeq(p: Path): Long =
      p.getFileName.toString.stripPrefix("block-").stripSuffix(".bin").toLong

    private def listBlocks(): Seq[Path] = {
      val s = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.getFileName.toString.matches("block-\\d+\\.bin"))
          .toSeq.sortBy(blockSeq)
      } finally s.close()
    }

    def push(block: Array[Byte]): Unit = {
      val n = seq.incrementAndGet()
      val tmp = dir.resolve(s".tmp-$n")
      Files.write(tmp, block)
      Files.move(tmp, dir.resolve(f"block-$n%019d.bin"),
        StandardCopyOption.ATOMIC_MOVE)
      // bounded disk (remotewrite -remoteWrite.maxDiskUsagePerURL): a
      // long outage must not fill the edge box — drop the OLDEST blocks
      // (like the reference's persistent queue) and say so loudly
      // the sender deletes concurrently — treat a vanished file as size 0
      def sizeOf(p: Path): Long =
        try Files.size(p) catch { case _: Exception => 0L }
      var blocks = listBlocks()
      var total = blocks.map(sizeOf).sum
      while (total > maxQueueBytes && blocks.size > 1) {
        val victim = blocks.head
        val sz = sizeOf(victim)
        System.err.println(
          s"[agent] queue $dir over ${maxQueueBytes}B: dropping oldest ${victim.getFileName}")
        Files.deleteIfExists(victim)
        blocks = blocks.tail
        total -= sz
      }
    }

    def backlog(): Int = listBlocks().size

    private def send(block: Array[Byte]): Boolean = {
      val conn = new java.net.URI(
        s"$url/internal/insert?version=$InsertProtocolVersion")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setConnectTimeout(3000)
        conn.setReadTimeout(120000)
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/octet-stream")
        conn.setRequestProperty("Content-Encoding", "zstd")
        conn.getOutputStream.write(block)
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        if (is != null) { is.readAllBytes(); is.close() }
        // a 4xx block is poison: the remote parsed and REJECTED it, so a
        // retry can never succeed — drop it loudly (the reference logs
        // and drops on permanent errors too) instead of wedging the queue
        if (code >= 400 && code < 500) {
          System.err.println(s"[agent] $url rejected block with $code; dropping")
          return true
        }
        code >= 200 && code < 300
      } finally conn.disconnect()
    }

    val sender = new Thread(() => {
      var backoffMs = 50L
      while (!stopped) {
        val next = listBlocks().headOption
        next match {
          case None =>
            try Thread.sleep(20) catch { case _: InterruptedException => () }
          case Some(p) =>
            val ok =
              try send(Files.readAllBytes(p))
              catch { case _: Throwable => false }
            if (ok) {
              Files.deleteIfExists(p)
              backoffMs = 50L
            } else {
              try Thread.sleep(backoffMs) catch { case _: InterruptedException => () }
              backoffMs = math.min(backoffMs * 2, maxBackoffMs)
            }
        }
      }
    }, s"graft-agent-sender-$idx")
    sender.setDaemon(true)
  }

  private val queues = remoteUrls.zipWithIndex.map { case (u, i) =>
    new RemoteQueue(i, u.stripSuffix("/")) }

  /** Blocks still waiting to be sent (0 = fully drained). */
  def backlog(): Int = queues.map(_.backlog()).sum

  // --------------------------------------------------------- HTTP front

  private def tenantOf(ex: HttpExchange): String = {
    def h(n: String): String =
      Option(ex.getRequestHeaders.getFirst(n)).getOrElse("").trim
    QueryServer.canonTenant(
      (h("AccountID"), h("ProjectID")) match {
        case ("", "") => "0:0"
        case (a, "") => if (a.contains(":")) a else s"$a:0"
        case ("", p) => s"0:$p"
        case (a, p) => s"$a:$p"
      })
  }

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, UTF_8) ->
          java.net.URLDecoder.decode(v, UTF_8)
      }.toMap

  /** One flattened JSON object → InsertRow (jsonline.go semantics via the
    * engine's own kernels: first-present time/msg field wins, stream
    * fields become canonical tags, unparseable time degrades to now). */
  private def rowOf(m: java.util.LinkedHashMap[String, String],
                    tenant: String, streamFields: Seq[String],
                    timeFields: Seq[String], msgFields: Seq[String]): InsertRow = {
    val ts = timeFields.iterator.flatMap(k => Option(m.get(k)))
      .flatMap(v => Option(graft.functions.GoTime.parseIngestNanos(v)))
      .map(_.longValue).nextOption().getOrElse(System.currentTimeMillis * 1000000L)
    val msgKey = msgFields.find(m.containsKey).getOrElse("_msg")
    val msg = Option(m.get(msgKey)).getOrElse("")
    val tags = streamFields.flatMap(f => Option(m.get(f)).map(f -> _))
    val timeKey = timeFields.find(m.containsKey).orNull
    val fields = Seq.newBuilder[(String, String)]
    fields += "_msg" -> msg
    m.forEach { (k, v) =>
      if (k != msgKey && k != timeKey && !streamFields.contains(k))
        fields += k -> v
    }
    InsertRow(tenant, tags, ts, fields.result())
  }

  private def csv(s: String): Seq[String] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty)

  // --------------------------------------------------- syslog transport

  @volatile private var syslogSock: Option[java.net.ServerSocket] = None
  private val syslogConns = java.util.concurrent.ConcurrentHashMap
    .newKeySet[java.net.Socket]()

  /** Start the agent's syslog TCP listener (syslog/syslog.go:38-60 at
    * the edge): RFC 6587 frames → SyslogParse (3164/5424, structured
    * data) → InsertRow into the same pending buffer the HTTP routes
    * feed. Lines enqueue as the reader yields them; the flusher thread
    * ships on its normal cadence. Returns the bound port. */
  def startSyslogTcp(streamFields: Seq[String] = Seq("hostname"),
                     port: Int = 0, tenant: String = "0:0"): Int = {
    val sock = new java.net.ServerSocket(port, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    syslogSock = Some(sock)
    val accept = new Thread(() => {
      while (!sock.isClosed) {
        try {
          val conn = sock.accept()
          syslogConns.add(conn)
          val t = new Thread(() => {
            try {
              val rd = new graft.streaming.SyslogLineReader(conn.getInputStream)
              while (rd.nextLine()) {
                val line = rd.line
                if (line.nonEmpty) {
                  // RFC 3164 timestamps carry no year: resolve per message
                  // (a long-lived agent crosses year rollovers)
                  val year = java.time.Year.now(java.time.ZoneOffset.UTC).getValue
                  val m = graft.functions.SyslogParse.parse(line, year, 0)
                  enqueueRows(Seq(rowOf(m, tenant, streamFields,
                    timeFields = Seq("timestamp"),
                    msgFields = Seq("message"))))
                }
              }
              rd.error.foreach(e =>
                System.err.println(s"[agent-syslog] read error: $e"))
            } catch { case _: java.io.IOException => /* sender hung up */ }
            finally { syslogConns.remove(conn); conn.close() }
          }, "graft-agent-syslog-conn")
          t.setDaemon(true) // an idle open connection must not block JVM exit
          t.start()
        } catch { case _: java.io.IOException => /* closed */ }
      }
    }, "graft-agent-syslog-accept")
    accept.setDaemon(true)
    accept.start()
    sock.getLocalPort
  }

  def start(): Int = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    serverOpt = Some(server)
    def route(path: String)(
        f: (HttpExchange, Map[String, String], Array[Byte]) => Unit): Unit =
      server.createContext(path, (ex: HttpExchange) => {
        try {
          val body = ex.getRequestBody.readAllBytes()
          // transparent decompression like the engine's ingest front
          // (gzip / deflate / zstd / snappy by Content-Encoding)
          val enc = Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
            .getOrElse("").toLowerCase
          def readAll(is: java.io.InputStream): Array[Byte] =
            try is.readAllBytes() finally is.close()
          val raw =
            if (enc.contains("zstd")) zstdDecompress(body)
            else if (enc.contains("gzip"))
              readAll(new java.util.zip.GZIPInputStream(
                new java.io.ByteArrayInputStream(body)))
            else if (enc.contains("deflate"))
              readAll(new java.util.zip.InflaterInputStream(
                new java.io.ByteArrayInputStream(body)))
            else if (enc.contains("snappy"))
              org.xerial.snappy.Snappy.uncompress(body)
            else body
          f(ex, params(ex), raw)
        } catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.toString)
            .replace("\\", "\\\\").replace("\"", "\\\"")
          val b = s"""{"error":"$msg"}""".getBytes(UTF_8)
          ex.sendResponseHeaders(400, b.length)
          ex.getResponseBody.write(b)
        } finally ex.close()
      })
    route("/insert/jsonline") { (ex, ps, body) =>
      val tf = ps.get("_time_field").map(csv).getOrElse(Seq("_time"))
      val mf = ps.get("_msg_field").map(csv).getOrElse(Seq("_msg"))
      val sf = ps.get("_stream_fields").map(csv).getOrElse(Nil)
      val tenant = tenantOf(ex)
      val rows = new String(body, UTF_8).split("\n").toSeq
        .map(_.trim).filter(_.nonEmpty)
        .flatMap(l => Option(graft.functions.JsonFlattenExpr.flatten(l)))
        .map(rowOf(_, tenant, sf, tf, mf))
      enqueueRows(rows)
      val b = """{"status":"ok"}""".getBytes(UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
    }
    route("/insert/elasticsearch/_bulk") { (ex, ps, body) =>
      val sf = ps.get("_stream_fields").map(csv).getOrElse(Nil)
      val tenant = tenantOf(ex)
      val metaKeys = Set("index", "create", "delete", "update")
      // a bulk action line ({"index":{...}} etc.) flattens to keys that
      // all live under one action name — skip those, keep the documents
      def isActionLine(m: java.util.LinkedHashMap[String, String]): Boolean = {
        import scala.jdk.CollectionConverters._
        val ks = m.keySet().asScala
        ks.isEmpty ||
          ks.forall(k => metaKeys.exists(a => k == a || k.startsWith(a + ".")))
      }
      val rows = new String(body, UTF_8).split("\n").toSeq
        .map(_.trim).filter(_.nonEmpty)
        .flatMap(l => Option(graft.functions.JsonFlattenExpr.flatten(l)))
        .filterNot(isActionLine)
        .map(rowOf(_, tenant, sf,
          timeFields = Seq("@timestamp", "timestamp"),
          msgFields = Seq("message", "_msg")))
      enqueueRows(rows)
      val b = """{"took":0,"errors":false}""".getBytes(UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
    }
    // ---- remaining insert protocols (vlagent fronts them all,
    // app/vlagent/main.go): decoded at the edge with the engine's own
    // Spark-free readers (proto) / AgentParsers (JSON, semantics pinned
    // to streaming/Ingest.scala by the LogAgentSpec fidelity cases),
    // then shipped over the same durable native-protocol queue ----
    def enqueueDecoded(rows: Seq[AgentParsers.Row], tenant: String,
                       streamFields: Seq[String]): Unit =
      enqueueRows(rows.map { case (tsNs, msg, fields) =>
        val ts = if (tsNs == 0L) System.currentTimeMillis * 1000000L else tsNs
        val tags = streamFields.flatMap(f => fields.find(_._1 == f))
        InsertRow(tenant, tags, ts,
          ("_msg" -> msg) +: fields.filterNot(f => streamFields.contains(f._1)))
      })
    def looksJson(ex: HttpExchange, body: Array[Byte]): Boolean = {
      val ctype = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
      val startsBrace = body.dropWhile(b =>
        b == ' ' || b == '\n' || b == '\r' || b == '\t')
        .headOption.contains('{'.toByte)
      ctype.contains("json") || (!ctype.contains("protobuf") && startsBrace)
    }
    route("/insert/loki/api/v1/push") { (ex, ps, body) =>
      val sf = ps.get("_stream_fields").map(csv).getOrElse(Nil)
      val rows =
        if (looksJson(ex, body)) AgentParsers.lokiJson(body)
        else graft.streaming.LokiProto.parsePushRequest(body).map(e =>
          (e.tsNanos, e.line, e.labels.toSeq.sortBy(_._1)))
      enqueueDecoded(rows, tenantOf(ex), sf)
      ex.sendResponseHeaders(204, -1)
    }
    route("/insert/opentelemetry/v1/logs") { (ex, ps, body) =>
      val sf = ps.get("_stream_fields").map(csv).getOrElse(Nil)
      val rows =
        if (looksJson(ex, body)) AgentParsers.otlpJson(body)
        else graft.streaming.OtlpProto.parseExportLogs(body).map { r =>
          val fields = (r.resAttrs ++ r.attrs ++
            (if (r.severityText.nonEmpty) Map("severity" -> r.severityText)
             else Map.empty)).toSeq
          (r.tsNanos, r.body, fields)
        }
      enqueueDecoded(rows, tenantOf(ex), sf)
      val b = "{}".getBytes(UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
    }
    route("/insert/datadog/api/v2/logs") { (ex, ps, body) =>
      val sf = ps.get("_stream_fields").map(csv).getOrElse(Nil)
      enqueueDecoded(AgentParsers.datadogJson(body), tenantOf(ex), sf)
      val b = "{}".getBytes(UTF_8)
      ex.sendResponseHeaders(202, b.length)
      ex.getResponseBody.write(b)
    }
    route("/insert/journald/upload") { (ex, ps, body) =>
      val sf = ps.get("_stream_fields").map(csv).getOrElse(Nil)
      val rows = graft.streaming.JournaldExport.parse(body).map { e =>
        val msg = e.fields.find(_._1 == "_msg").map(_._2).getOrElse("")
        (e.tsNanos, msg, e.fields.filter(_._1 != "_msg"))
      }
      enqueueDecoded(rows, tenantOf(ex), sf)
      ex.sendResponseHeaders(200, -1)
    }
    route("/metrics") { (ex, _, _) =>
      val b = (s"# TYPE graft_agent_backlog_blocks gauge\n" +
        s"graft_agent_backlog_blocks ${backlog()}\n").getBytes(UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
    }
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    flusher.start()
    queues.foreach(_.sender.start())
    server.getAddress.getPort
  }

  /** Drain the in-memory buffer to disk and stop accepting. Queued blocks
    * stay on disk for the next start (or for the senders, if the remote
    * comes back before the JVM exits). */
  def stop(): Unit = {
    stopped = true
    syslogSock.foreach(s => try s.close() catch { case _: Throwable => })
    // unblock per-connection readers parked on an idle socket
    syslogConns.forEach(c => try c.close() catch { case _: Throwable => })
    syslogConns.clear()
    flush()
    serverOpt.foreach(_.stop(0))
  }
}
