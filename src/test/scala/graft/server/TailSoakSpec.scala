package graft.server

import graft.SparkSuite

/** Live tail under load: continuous syslog-TCP ingest, an active
  * /select/logsql/tail poller, and concurrent compaction swapping the
  * files underneath — with row-exact accounting. Every sent sequence
  * number must be delivered exactly once: a dropped row means a poll
  * window raced a compaction swap (LogStore.withStaleRetry contract), a
  * duplicate means TailState's per-stream timestamp dedup failed across
  * overlapping windows. */
class TailSoakSpec extends SparkSuite {

  test("tail delivers every row exactly once across compaction swaps") {
    val dir = s"/root/repo/target/tailsoak/${System.nanoTime()}"
    val ing = new IngestServer(spark, dir)
    val sysPort = ing.startSyslogTcp(flushMs = 40)
    val qsrv = new QueryServer(spark,
      () => graft.store.LogStore.read(spark, dir), 0, storeDir = Some(dir))
    val qport = qsrv.start()
    val total = 900
    val received = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val duplicates = new java.util.concurrent.atomic.AtomicInteger
    val tailErr = new java.util.concurrent.atomic.AtomicReference[String]()
    val conn = new java.net.URI(
      s"http://127.0.0.1:$qport/select/logsql/tail?query=%2A&refresh_interval=40&max_polls=2000")
      .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
    val seqRe = "seq=(\\d+)".r
    val reader = new Thread(() => {
      try {
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
        var line = in.readLine()
        while (line != null) {
          seqRe.findFirstMatchIn(line).foreach { m =>
            if (!received.add(m.group(1).toInt)) duplicates.incrementAndGet()
          }
          line = if (received.size >= total) null else in.readLine()
        }
      } catch {
        case _: java.io.IOException => () // disconnect() at the end
        case e: Throwable => tailErr.set(e.toString)
      }
    }, "tail-soak-reader")
    reader.setDaemon(true)
    reader.start()
    try {
      val sock = new java.net.Socket("127.0.0.1", sysPort)
      val out = sock.getOutputStream
      // two streams (hostnames), timestamps GLOBALLY strictly increasing
      // in send order: one TCP connection preserves order into the flush
      // queue, so every later flush's rows sit past the tail's window
      // start, and per-stream µs-unique times make the timestamp dedup
      // exact (the reference's tailProcessor contract is the same)
      (0 until total).foreach { n =>
        val host = if (n % 2 == 0) "hostA" else "hostB"
        val line =
          f"<165>1 2024-06-01T10:00:00.$n%06dZ $host app - - - soak seq=$n\n"
        out.write(line.getBytes("UTF-8"))
        if (n % 300 == 299) {
          out.flush()
          // a compaction mid-stream: merges flushed files and swaps them
          // under the active poll loop
          graft.store.Compaction.optimize(spark, dir,
            targetFileBytes = 64L << 20, minFilesToCompact = 2)
        }
      }
      out.flush()
      sock.close()
      // final merge after the last flush lands, then drain the tail
      val deadline = System.nanoTime() + 90L * 1000000000L
      var compacted = false
      while (received.size < total && System.nanoTime() < deadline &&
             tailErr.get == null) {
        Thread.sleep(200)
        if (!compacted && received.size > total / 2) {
          graft.store.Compaction.optimize(spark, dir,
            targetFileBytes = 64L << 20, minFilesToCompact = 2)
          compacted = true
        }
      }
      assert(tailErr.get == null, s"tail reader failed: ${tailErr.get}")
      val missing = (0 until total).filterNot(received.contains)
      assert(missing.isEmpty,
        s"${missing.size} rows never delivered (first: ${missing.take(10)})")
      assert(duplicates.get == 0, s"${duplicates.get} duplicate deliveries")
    } finally {
      conn.disconnect()
      qsrv.stop()
      ing.stop()
    }
  }
}
