package graft.server

import graft.SparkSuite
import graft.store.{Compaction, FieldNameMeta, LogStore, ValueTypeMeta}
import org.apache.spark.sql.functions._

/** Retention lifecycle under load (round-12 verdict ask #5): day
  * partitions expire + streams prune + sidecar invalidation WHILE syslog
  * ingest, a tail poller, and metadata queries run concurrently.
  * TailSoakSpec's row-exact accounting extended across the expiry
  * boundary, plus: field_names must never serve counts for dropped days,
  * dead sidecar keys must actually disappear, and the streams table must
  * lose streams that existed only in expired days. */
class RetentionSoakSpec extends SparkSuite {
  import spark.implicits._

  test("expiry mid-stream: tail row-exact, sidecars exact, streams pruned") {
    val dir = s"/root/repo/target/retsoak/${System.nanoTime()}"
    // --- two OLD days (own streams) through the bulk path + compaction:
    // sidecars hold exact per-part stats for them
    val oldLines = (0 until 400).map { i =>
      val day = if (i % 2 == 0) "2024-05-20" else "2024-05-21"
      s"""{"_time":"${day}T10:00:${f"${i % 60}%02d"}Z","_msg":"old row $i",""" +
        s""""hostname":"${if (i % 2 == 0) "olda" else "oldb"}",""" +
        s""""extra":"legacy$i"}"""
    }
    graft.streaming.Ingest.appendBatch(
      graft.streaming.Ingest.parseJsonline(oldLines.toDF("value")),
      dir, Seq("hostname"))
    Compaction.optimize(spark, dir, minFilesToCompact = 1)
    val part = (d: String) => s"tenant=0:0/_day=$d"
    assert(FieldNameMeta.load(dir).keySet
      .exists(_.contains("_day=2024-05-20")), "old-day sidecar missing")

    // --- live machinery: syslog ingest + tail poller + query thread
    val ing = new IngestServer(spark, dir)
    val sysPort = ing.startSyslogTcp(flushMs = 40)
    val qsrv = new QueryServer(spark,
      () => LogStore.read(spark, dir), 0, storeDir = Some(dir))
    val qport = qsrv.start()
    val total = 600
    val received = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val duplicates = new java.util.concurrent.atomic.AtomicInteger
    val tailErr = new java.util.concurrent.atomic.AtomicReference[String]()
    val conn = new java.net.URI(
      s"http://127.0.0.1:$qport/select/logsql/tail?query=seq&refresh_interval=40&max_polls=2000")
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
        case _: java.io.IOException => ()
        case e: Throwable => tailErr.set(e.toString)
      }
    }, "ret-soak-tail")
    reader.setDaemon(true); reader.start()
    // concurrent metadata queries: every observed field_names answer must
    // be consistent with SOME valid store state (never a dropped-day
    // count after expiry completes — checked exactly at the end; during
    // the race the guard is "no exception, no negative/garbage counts")
    val qErr = new java.util.concurrent.atomic.AtomicReference[String]()
    @volatile var querying = true
    val querier = new Thread(() => {
      try while (querying) {
        val c = new java.net.URI(
          s"http://127.0.0.1:$qport/select/logsql/field_names?query=%2A")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        val ok = c.getResponseCode == 200
        val body = new String(c.getInputStream.readAllBytes(), "UTF-8")
        c.disconnect()
        // an EMPTY values list is legitimate for the instant between the
        // expiry dropping both old days and the first new-day flush
        // landing; anything else without _msg is a stale/garbled answer
        if (!ok || !(body.contains("_msg") || body.contains("\"values\":[]")))
          qErr.set(s"bad field_names: $body")
        Thread.sleep(25)
      } catch { case e: Throwable => qErr.set(e.toString) }
    }, "ret-soak-query")
    querier.setDaemon(true); querier.start()

    try {
      val sock = new java.net.Socket("127.0.0.1", sysPort)
      val out = sock.getOutputStream
      (0 until total).foreach { n =>
        val host = if (n % 2 == 0) "hostA" else "hostB"
        val line =
          f"<165>1 2024-06-01T10:00:00.$n%06dZ $host app - - - soak seq=$n\n"
        out.write(line.getBytes("UTF-8"))
        if (n == 200) {
          out.flush()
          // EXPIRY mid-stream: drops both May days (cutoff 2024-05-28),
          // prunes streams, invalidates sidecars — under live traffic
          val dropped = Compaction.enforceRetention(spark, dir, 5,
            today = java.time.LocalDate.parse("2024-06-02"))
          assert(dropped == Seq("2024-05-20", "2024-05-21"), dropped)
        }
        if (n == 400) {
          out.flush()
          Compaction.optimize(spark, dir, minFilesToCompact = 2)
        }
      }
      out.flush(); sock.close()
      val deadline = System.nanoTime() + 90L * 1000000000L
      while (received.size < total && System.nanoTime() < deadline &&
             tailErr.get == null) Thread.sleep(200)
      querying = false
      assert(tailErr.get == null, s"tail reader failed: ${tailErr.get}")
      assert(qErr.get == null, s"query thread failed: ${qErr.get}")
      val missing = (0 until total).filterNot(received.contains)
      assert(missing.isEmpty,
        s"${missing.size} rows lost across expiry (first: ${missing.take(10)})")
      assert(duplicates.get == 0, s"${duplicates.get} duplicate deliveries")

      // --- post-expiry exactness
      // field_names == scan ground truth of the REMAINING data (and via
      // the sidecar path once compaction re-counted the live day)
      Compaction.optimize(spark, dir, minFilesToCompact = 1)
      val served0 = FieldNameMeta.served.get
      val names = LogStore.withStaleRetry(dir) {
        graft.logql.Compiler.run(LogStore.read(spark, dir), "* | field_names")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      assert(names("_msg") == total.toLong,
        s"field_names counts dropped-day rows: $names")
      assert(!names.contains("extra"),
        s"dropped-day-only field still reported: $names")
      assert(FieldNameMeta.served.get == served0 + 1,
        "post-expiry field_names did not serve from the sidecar")
      // dead sidecar keys actually gone
      val fnKeys = FieldNameMeta.load(dir).keySet
      val vtKeys = ValueTypeMeta.load(dir).keySet
      Seq("2024-05-20", "2024-05-21").foreach { d =>
        assert(!fnKeys.exists(_.contains(s"_day=$d")), s"stale fn key for $d")
        assert(!vtKeys.exists(_.contains(s"_day=$d")), s"stale vt key for $d")
      }
      // streams of expired-only days pruned; live streams intact
      val streams = spark.read.parquet(s"$dir/streams")
        .select(to_json(col("_stream"))).as[String].collect().toSet
      assert(!streams.exists(_.contains("olda")) &&
             !streams.exists(_.contains("oldb")), streams)
      assert(streams.exists(_.contains("hostA")) &&
             streams.exists(_.contains("hostB")), streams)
    } finally {
      conn.disconnect(); qsrv.stop(); ing.stop()
    }
  }
}
