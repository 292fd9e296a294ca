package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8

/** 200M-row scale soak (round-12 verdict ask #3 — the 100× extrapolation's
  * next decade after r11's 2M and r12's 20M):
  *
  *  1. Build a 200M-row / 30-day store through the production bulk-ingest
  *     path (LogStore.ingest + Compaction.optimize), same deterministic
  *     generator as ScaleProbe.
  *  2. Run the ScaleProbe query mix against it (baseline medians).
  *  3. ≥10 minutes of CONCURRENT load: sustained HTTP jsonline ingest
  *     into the same store + background compaction ticks + a retention
  *     expiry dropping the two oldest days mid-soak + a live tail poller
  *     + the query mix looping — recording per-minute query latencies
  *     and any error.
  *  4. Re-run the query mix after the dust settles (post-soak medians).
  *
  * Prints `SOAK ...` lines for SCALECHECK_r13.md.
  */
object Soak200M {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(200000000L)
    val soakMinutes = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCallSite("graft")
    import graft.store.{Compaction, LogStore}
    import graft.logql.Compiler

    val dir = s"/root/repo/target/graft_scale/v1/rows$rows"
    val t0 = System.nanoTime()
    if (!new java.io.File(s"$dir/logs/_SUCCESS").exists()) {
      val spanUs = 30L * 86400 * 1000000
      val startUs = 1704067200000000L // 2024-01-01T00:00:00Z
      val types = array(Seq("view", "click", "purchase", "error", "signup").map(lit): _*)
      val df = spark.range(0, rows, 1, 256)
        .withColumn("_time",
          timestamp_micros(lit(startUs) + col("id") * lit(math.max(spanUs / rows, 1L))))
        .withColumn("event_type", element_at(types, (pmod(xxhash64(col("id"), lit(1)), lit(5)) + 1).cast("int")))
        .withColumn("user_id", pmod(xxhash64(col("id"), lit(2)), lit(100000L)))
        .withColumn("value", (pmod(xxhash64(col("id"), lit(3)), lit(100000L)) / lit(100.0)))
        .withColumn("app", concat(lit("app"), pmod(xxhash64(col("id"), lit(4)), lit(16L))))
        .withColumn("_msg", format_string("user %d did %s from %s worth %.2f",
          col("user_id"), col("event_type"), col("app"), col("value")))
        .select("_time", "_msg", "event_type", "user_id", "value", "app")
      LogStore.ingest(df, dir, Seq("app"), filesPerDay = 8)
      val tIngest = (System.nanoTime() - t0) / 1e9
      println(f"SOAK build: ingest ${tIngest}%.0fs")
      Compaction.optimize(spark, dir, minFilesToCompact = 2,
        skipAtTargetSize = true)
      println(f"SOAK build: compact ${(System.nanoTime() - t0) / 1e9 - tIngest}%.0fs")
    }
    def du(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
      else f.length()
    println(f"SOAK store: ${du(new java.io.File(s"$dir/logs")) / 1e6}%.0f MB on disk")

    val shapes: Seq[(String, String)] = Seq(
      ("full_count", "* | stats count() c"),
      ("word_scan", "purchase | stats count() c"),
      ("prune_agg",
        """{app="app3"} _time:[2024-01-05, 2024-01-07) | stats by (event_type) count() hits"""),
      ("prank_top",
        """* | sort by (value desc) partition by (event_type) rank as r
           | where r:<=3 | fields event_type, r"""),
      ("day_quantile",
        """* | stats by (_time:1d) quantile(0.99, value) p99 | sort by (_time)"""),
      ("topk", "* | top 5 by (user_id)"))

    def queryMix(label: String, reps: Int = 3): Unit =
      shapes.foreach { case (name, q) =>
        def once(): Double = LogStore.withStaleRetry(dir) {
          val s = System.nanoTime()
          Compiler.run(LogStore.read(spark, dir), q).collect()
          (System.nanoTime() - s) / 1e9
        }
        once() // warm
        val med = Seq.fill(reps)(once()).sorted.apply(reps / 2)
        println(f"SOAK $label $name%-14s median=${med}%.2fs")
      }

    queryMix("baseline")

    // ---- concurrent soak -------------------------------------------------
    val errors = new java.util.concurrent.atomic.AtomicLong
    def logErr(who: String, e: Throwable): Unit = {
      errors.incrementAndGet()
      println(s"SOAK ERROR [$who]: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
    }
    val ingestSrv = new graft.server.IngestServer(spark, dir,
      defaultStreamFields = Seq("app"))
    val ingestPort = ingestSrv.start()
    val querySrv = new graft.server.QueryServer(spark,
      () => LogStore.read(spark, dir), 0, storeDir = Some(dir))
    val queryPort = querySrv.start()
    val lifecycle = Compaction.startBackground(spark, dir, intervalMs = 30000L)
    // delta-based lose-nothing baseline: a re-run over an existing store
    // (or a crashed prior attempt) may already hold soak rows
    def soakRows(): Long = LogStore.withStaleRetry(dir) {
      Compiler.run(LogStore.read(spark, dir),
        "event_type:soak | stats count() c").collect().head.getLong(0)
    }
    val soakRows0 = soakRows()
    @volatile var stop = false
    try {

    val ingested = new java.util.concurrent.atomic.AtomicLong
    val ingestThreads = (0 until 4).map { t =>
      val th = new Thread(() => {
        var i = 0
        while (!stop) {
          try {
            val body = (0 until 2000).map { j =>
              s"""{"_time":"2024-01-30T2${t % 4}:${f"${i % 60}%02d"}:${f"${j % 60}%02d"}Z","_msg":"soak ingest row $t $i $j","app":"app${j % 16}","event_type":"soak","user_id":${j % 100000},"value":1.5}"""
            }.mkString("\n").getBytes(UTF_8)
            val conn = new java.net.URI(
              s"http://127.0.0.1:$ingestPort/insert/jsonline?_stream_fields=app")
              .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
            conn.setRequestMethod("POST"); conn.setDoOutput(true)
            conn.getOutputStream.write(body)
            if (conn.getResponseCode == 200) ingested.addAndGet(2000L)
            else errors.incrementAndGet()
            conn.getInputStream.readAllBytes(); conn.disconnect()
          } catch { case e: Throwable => logErr(s"ingest$t", e) }
          i += 1
          // ~25k rows/s across 4 threads: sustained pressure without
          // growing the store past ~8% over the soak window
          try Thread.sleep(300) catch { case _: InterruptedException => () }
        }
      }, s"soak-ingest-$t")
      th.setDaemon(true); th.start(); th
    }
    val tailPolls = new java.util.concurrent.atomic.AtomicLong
    val tailThread = new Thread(() => {
      while (!stop) {
        try {
          val q = java.net.URLEncoder.encode("soak", UTF_8)
          val conn = new java.net.URI(
            s"http://127.0.0.1:$queryPort/select/logsql/tail?query=$q&max_polls=3")
            .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setReadTimeout(120000)
          if (conn.getResponseCode == 200) {
            conn.getInputStream.readAllBytes()
            tailPolls.incrementAndGet()
          } else errors.incrementAndGet()
          conn.disconnect()
        } catch { case e: Throwable => logErr("tail", e) }
      }
    }, "soak-tail")
    tailThread.setDaemon(true); tailThread.start()

    val soakStart = System.nanoTime()
    var retentionDone = false
    var minute = 0
    while ((System.nanoTime() - soakStart) / 1e9 < soakMinutes * 60.0) {
      minute += 1
      try queryMix(s"min$minute", reps = 1)
      catch { case e: Throwable => logErr("querymix", e) }
      if (!retentionDone && minute >= soakMinutes / 2) {
        // mid-soak retention: drop the two oldest days under live load
        try {
          val dropped = Compaction.enforceRetention(spark, dir, 28,
            today = java.time.LocalDate.parse("2024-01-31"))
          println(s"SOAK retention dropped days: ${dropped.mkString(",")}")
        } catch { case e: Throwable => logErr("retention", e) }
        retentionDone = true
      }
      val elapsed = (System.nanoTime() - soakStart) / 1e9
      println(f"SOAK tick min$minute elapsed=${elapsed}%.0fs ingested=${ingested.get} " +
        f"tail_polls=${tailPolls.get} errors=${errors.get}")
    }
    stop = true
    ingestThreads.foreach(_.join(15000))
    tailThread.join(15000)
    lifecycle.close()

    // drain the committer, then the lose-nothing check is exact.
    // soakRows() goes through withStaleRetry (the client contract for
    // reads racing a compaction swap): attempt 1 of this soak died
    // exactly here — lifecycle.close() doesn't join an in-flight tick,
    // whose swap of the hot appended day removed a listed file under an
    // unwrapped read (FAILED_READ_FILE.FILE_NOT_EXIST, one-off by design)
    try {
      val conn = new java.net.URI(
        s"http://127.0.0.1:$ingestPort/internal/force_flush")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write(Array.emptyByteArray)
      conn.getResponseCode; conn.getInputStream.readAllBytes(); conn.disconnect()
    } catch { case e: Throwable => logErr("force_flush", e) }
    val soakDelta = soakRows() - soakRows0
    if (soakDelta != ingested.get)
      println(s"SOAK ERROR [lose-nothing]: ingested=${ingested.get} visible=$soakDelta")
    else println(s"SOAK lose-nothing: ingested=${ingested.get} visible=$soakDelta OK")
    queryMix("post")
    println(f"SOAK final: errors=${errors.get} tail_polls=${tailPolls.get} " +
      f"store=${du(new java.io.File(s"$dir/logs")) / 1e6}%.0f MB")
    } finally {
      // always tear down: the servers' dispatcher threads are non-daemon,
      // so an exception that skips stop() leaves a zombie JVM behind
      stop = true
      try ingestSrv.stop() finally {
        try querySrv.stop() finally {
          try lifecycle.close() finally spark.stop()
        }
      }
    }
  }
}
