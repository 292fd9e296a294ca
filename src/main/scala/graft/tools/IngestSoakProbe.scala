package graft.tools

import org.apache.spark.sql.SparkSession

/** Small-file soak for the streaming ingest path: many small HTTP
  * jsonline posts (plus a syslog TCP stream) fragment the store into
  * per-flush parquet files; the probe measures the fragmentation
  * (files per day partition), the read-amplification it causes (query
  * latency on the fragmented vs compacted store), and what a compaction
  * pass costs — the numbers behind the claim that the group-committer +
  * background Compaction keep a continuously-ingesting store readable.
  *
  * Usage: runMain graft.tools.IngestSoakProbe [posts] [threads]
  */
object IngestSoakProbe {
  def main(args: Array[String]): Unit = {
    val posts = args.headOption.map(_.toInt).getOrElse(10000)
    val threads = args.lift(1).map(_.toInt).getOrElse(8)
    // "bg" → run the background compactor DURING ingest (15s ticks) and
    // report the steady-state fragmentation + compaction lag it holds
    val bg = args.lift(2).contains("bg")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"/root/repo/target/graft_soak/run-${System.nanoTime()}"
    val srv = new graft.server.IngestServer(spark, dir)
    val port = srv.start()
    val sysPort = srv.startSyslogTcp(flushMs = 100L)

    val days = 5
    val rowsPerPost = 10
    def post(body: Array[Byte]): Int = {
      val conn = new java.net.URI(
        s"http://127.0.0.1:$port/insert/jsonline?_stream_fields=app")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write(body)
      val code = conn.getResponseCode
      conn.getInputStream.readAllBytes(); conn.disconnect(); code
    }
    def body(seed: Int): Array[Byte] =
      (0 until rowsPerPost).map { r =>
        val d = (seed + r) % days + 1
        val mm = f"${seed % 60}%02d"
        val ss = f"${r % 60}%02d"
        s"""{"_time":"2024-03-0${d}T10:$mm:$ss.000Z","_msg":"soak row $seed-$r some text payload for realistic width","app":"app${seed % 7}","k":"v$r"}"""
      }.mkString("\n").getBytes("UTF-8")

    def filesPerDay(): Seq[Int] = {
      val base = new java.io.File(s"$dir/logs")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val parts = Option(base.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .filter(f => f.isDirectory && f.getName.startsWith("_day="))
      parts.map(d => walk(d).count(_.getName.endsWith(".parquet"))).toSeq
    }

    // ---- phase A: fragment via many small posts ----
    val compactor =
      if (bg) Some(graft.store.Compaction.startBackground(spark, dir,
        intervalMs = 15000L))
      else None
    val maxFilesSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val sampler = new Thread(() => {
      // no `return` here: inside a lambda it throws NonLocalReturnControl,
      // which escapes (the enclosing frame is on another thread's stack)
      // and kills the sampler with a noisy stack trace
      var live = true
      while (live && !Thread.currentThread().isInterrupted) {
        try {
          val f = filesPerDay()
          if (f.nonEmpty) maxFilesSeen.getAndUpdate(m => math.max(m, f.max))
          Thread.sleep(2000)
        } catch { case _: InterruptedException => live = false }
      }
    })
    if (bg) sampler.start()
    val t0 = System.nanoTime()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    (0 until posts).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          if (post(body(i)) != 200) errs.incrementAndGet()
          done.incrementAndGet()
        }
      })
    }
    // interleave a syslog TCP stream (the second ingest protocol)
    val sys = new java.net.Socket("127.0.0.1", sysPort)
    val out = new java.io.PrintWriter(sys.getOutputStream, true)
    (1 to 2000).foreach { i =>
      out.println(s"<34>1 2024-03-0${i % days + 1}T12:00:00Z host$i app - - - soak syslog line $i")
      if (i % 200 == 0) Thread.sleep(20)
    }
    out.flush(); sys.close()
    pool.shutdown()
    pool.awaitTermination(30, java.util.concurrent.TimeUnit.MINUTES)
    val ingestSec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500) // let the syslog flusher drain
    val rows = posts.toLong * rowsPerPost + 2000
    if (bg) {
      sampler.interrupt(); sampler.join(5000)
      println(s"[soak] bg_compaction=on max_files_per_day_seen=${maxFilesSeen.get} (compaction lag bound)")
    }

    def storeBytes(): Long = {
      def sz(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(sz).sum else f.length()
      sz(new java.io.File(dir))
    }
    def readMs(): Double = {
      val runs = (0 until 7).map { _ =>
        graft.store.LogStore.invalidateCaches(dir) // fresh file index: cold-read shape
        val t = System.nanoTime()
        graft.logql.Compiler.run(graft.store.LogStore.read(spark, dir),
          "soak | stats by (app) count() c").collect()
        (System.nanoTime() - t) / 1e6
      }
      runs.sorted.apply(3)
    }

    val preFiles = filesPerDay()
    val preBytes = storeBytes()
    val preRead = readMs()
    println(f"[soak] posts=$posts threads=$threads rows=$rows errs=${errs.get} ingest_sec=$ingestSec%.1f (${rows / ingestSec}%.0f rows/s)")
    println(s"[soak] files_per_day_pre=${preFiles.sorted.reverse.mkString(",")} total=${preFiles.sum} bytes=$preBytes")
    println(f"[soak] read_fragmented_ms=$preRead%.1f")

    // ---- phase B: one compaction pass ----
    val c0 = System.nanoTime()
    graft.store.Compaction.optimize(spark, dir)
    val compactSec = (System.nanoTime() - c0) / 1e9
    val postFiles = filesPerDay()
    val postBytes = storeBytes()
    val postRead = readMs()
    println(f"[soak] compact_sec=$compactSec%.1f")
    println(s"[soak] files_per_day_post=${postFiles.sorted.reverse.mkString(",")} total=${postFiles.sum} bytes=$postBytes")
    println(f"[soak] read_compacted_ms=$postRead%.1f read_amplification=${preRead / postRead}%.2fx")
    // correctness: row count must survive compaction exactly
    val n = graft.store.LogStore.read(spark, dir).count()
    println(s"[soak] rows_after_compact=$n (expected $rows) ${if (n == rows) "OK" else "MISMATCH"}")
    compactor.foreach(_.close())
    srv.stop()
    spark.stop()
    System.exit(if (n == rows && errs.get == 0) 0 else 1)
  }
}
