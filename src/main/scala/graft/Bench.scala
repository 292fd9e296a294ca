package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: one warmup pass (JVM/codegen/parquet-footer warmup),
  * then median-of-3 timed runs per query. Prints ONE JSON line for the
  * driver (BENCH_r{N}.json). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Spark's default openCostInBytes (4 MiB) treats every file open as
      // 4 MiB of scan work; against this store's small zstd day-parts it
      // shreds a 30-file / 1.6 MB scan into 30 ~150 ms tasks (measured:
      // store count 0.22s → 0.12s, stream_context 0.43s → 0.31s at 256 KiB).
      // A real open on local disk / SSD-backed object cache costs well
      // under 256 KiB of scan-equivalent time, and on a cluster the same
      // packing keeps tiny-part scans from occupying a task slot per file.
      // Big files are unaffected (bytes dominate the estimate).
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      // AQE stays on, as on a cluster: measured here, its partition
      // coalescing wins more than its per-stage re-planning costs
      // (iterative connected-components is 3x slower without it)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // static conf (JVM-first-session): the default 100-entry generated-
      // class cache thrashes under a 138-query suite (~900 Janino
      // recompiles per pass, ~12ms each, measured FloorProbe r12) — every
      // "fresh" run of a query re-compiled stages the warmup had already
      // built. 4096 holds the whole suite's classes.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fixed call site: every RDD materialization otherwise walks the
    // driver stack through ASM-visible frames to label the UI call site —
    // ~20ms per fresh execution, measured (CallSiteProbe); the UI is off
    spark.sparkContext.setCallSite("graft")
    // ingest first: it measures sustained request→commit throughput, which
    // a JVM full of 100+ queries' codegen classes and GC debris understates
    // by 3-4x versus the same code on a warm-but-clean session
    // ...but serving latency is even more debris-sensitive (single-digit
    // ms vs ingest's multi-second window), so the 6-request lastN probe
    // goes FIRST — measured 10.7ms after the 480k-row ingest vs 6-7ms
    // clean on the same host; ingest is insensitive to serverBench's
    // handful of plans
    // in-run environment calibration (r13 verdict #6: committed bench
    // numbers swung 2-3× with sandbox state and nothing in the artifact
    // let a reader reject a contaminated run): a FIXED CPU workload
    // (single- and all-core) and a fixed 64 MiB write+read, sampled at
    // start / pre-ingest / end. Compare these fields across artifacts
    // before comparing any throughput number — a calib drift of 2× means
    // the host, not the code, moved.
    val calibStart = calibrate()
    val (lastnMs, lastnDays) = serverBench(spark, sfDir)
    // scan before ingest: the ingest phase's JVM state (434 lingering
    // pool threads, grown heap) costs the scan a stable ~2.2× in-bench
    // that no isolated re-run reproduces (ScanAfterIngestProbe) — decode
    // bandwidth is a property of the code, so measure it on the cleaner
    // JVM; ingest itself is insensitive to the handful of scan plans
    val (scanBytes, scanSec) = scanBench(spark, sfDir)
    val calibPreIngest = calibrate()
    val (ingestRows, ingestSec, ingestPosts, ingestFlushes, rawB, storeB) =
      ingestBench()
    val names = SparkEntry.queries.keys.toSeq.sorted
    // per-query Spark job counts: local mode pays the scheduler floor once
    // PER JOB, so multi-job queries (AQE stages, broadcast builds, descent
    // steps) carry floor×jobs of fixed overhead — reporting the count lets
    // the DuckDB comparison subtract it analytically instead of guessing
    val jobCounter = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCounter.incrementAndGet()
    })
    // listener events are delivered on an async bus: a job started by the
    // action we just timed can be counted AFTER the action returns,
    // misattributing it to the next query — drain the bus before reading
    // the counter on either side of a delta (waitUntilEmpty is
    // private[spark] at the source level but public in bytecode)
    def drainListenerBus(): Unit = try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .foreach(_.invoke(bus))
    } catch { case _: Exception => Thread.sleep(30) }
    // a throwing query must be LOUD: round 6 mapped failures to a silent
    // -1s sentinel, which let 70 broken queries ship as a negative
    // adjusted_total with rc=0 — now each failure carries its exception
    // and is excluded from every total, with a top-level errors count
    def once(name: String): (Double, Long, Option[String]) = {
      drainListenerBus()
      val j0 = jobCounter.get
      val t0 = System.nanoTime()
      try {
        // acceptance hook for the error path itself: injecting one failure
        // must yield errors:1 and totals that exclude it
        if (sys.env.get("SPARK_GRAFT_INJECT_FAIL").contains(name))
          throw new RuntimeException("injected failure (SPARK_GRAFT_INJECT_FAIL)")
        SparkEntry.queries(name)(spark, sfDir).count()
      }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: $e")
        return (-1d, 0L,
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"))
      }
      val sec = (System.nanoTime() - t0) / 1e9
      drainListenerBus()
      (sec, jobCounter.get - j0, None)
    }
    names.foreach(once) // warmup
    // fixed per-query local-mode job overhead (scheduler + codegen floor),
    // measured as the median latency of a trivial 1-row action — reported
    // so the DuckDB-ratio comparison can exclude it arithmetically.
    // Sampled INTERLEAVED through the timed section, not just at the
    // edges: the floor drifts with JIT/GC state, it multiplies by the
    // query count in adjusted_total, and two edge-only medians have
    // swung the headline by several seconds between otherwise-identical
    // runs.
    // measured on the INTERACTIVE session: SparkEntry routes every
    // query whose leaf input is under the small-query threshold there
    // (all of them at bench SFs — see Sessions scaladoc), so the floor
    // each measured query actually pays is the interactive one
    val interactive = Sessions.interactive(spark)
    def noopSamples(k: Int): Seq[Double] = Seq.fill(k) {
      val t0 = System.nanoTime()
      interactive.range(1).count()
      (System.nanoTime() - t0) / 1e9
    }
    // marginal JOB floor, separate from the per-query floor: a query's
    // fixed cost is (planning + first job) + (jobs-1) × marginal-job.
    // Subtracting the full noop per job over-subtracts (the noop includes
    // planning, which multi-job queries pay once) — measured as the time
    // delta between a multi-job noop under AQE and the plain one, divided
    // by the extra jobs. The noop must be STRUCTURALLY representative: a
    // `range(2).repartition(2)` stage-job costs ~10ms, but a real query's
    // extra stage-job (file scan below it, AQE stage stats + scheduling of
    // a hash exchange, wider generated code) costs several times that — so
    // the probe is a 2-row parquet scan + shuffle + agg, the minimal shape
    // every multi-job query in this suite actually repeats.
    val tinyParquet = {
      val p = "/root/repo/target/bench_noop_tbl"
      if (!new java.io.File(s"$p/_SUCCESS").exists()) {
        import spark.implicits._
        Seq((1L, "a"), (2L, "b")).toDF("k", "v")
          .repartition(1).write.mode("overwrite").parquet(p)
      }
      p
    }
    // On the interactive path (AQE off) the whole DAG is ONE job; the
    // extra jobs real queries still pay are separate ACTIONS — broadcast
    // builds, in(subquery) materializations, iterative steps. The
    // marginal-job probe therefore uses a broadcast join (build job +
    // result job), the minimal 2-job shape on this path.
    def noopShuffleSamples(k: Int): Seq[(Double, Long)] = Seq.fill(k) {
      drainListenerBus()
      val j0 = jobCounter.get
      val t0 = System.nanoTime()
      val t = interactive.read.parquet(tinyParquet)
      t.join(org.apache.spark.sql.functions.broadcast(
          interactive.read.parquet(tinyParquet)), "k")
        .groupBy("k").count().count()
      val sec = (System.nanoTime() - t0) / 1e9
      drainListenerBus()
      (sec, jobCounter.get - j0)
    }
    val noopAcc = scala.collection.mutable.ArrayBuffer[Double]()
    val noopShufAcc = scala.collection.mutable.ArrayBuffer[(Double, Long)]()
    noopAcc ++= noopSamples(5)
    noopShufAcc ++= noopShuffleSamples(5)
    // WARM re-execution: collect() twice on the SAME Dataset. The second
    // collect reuses the cached queryExecution — optimized plan, codegen,
    // and every AQE stage already materialized — so only the final stage
    // re-runs: the steady state a dashboard hits through the serving
    // path's plan cache (QueryServer.planCache re-serves the same
    // DataFrame object the same way). count() would NOT measure this (it
    // wraps the plan in a fresh Dataset per call and re-executes from the
    // scan up). Measured inline per query, not at the end of the suite —
    // late-JVM GC debris would otherwise inflate every warm number ~2.5x.
    def warmOnce(n: String): Double =
      if (SparkEntry.isEffectful(n)) -1d
      else try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.collect() // materialize plan + AQE stages
        val ts = Seq.fill(3) {
          val t0 = System.nanoTime()
          df.collect()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        ts(1)
      } catch { case _: Throwable => -1d }
    val resultsAll = names.zipWithIndex.map { case (n, i) =>
      val runs = Seq.fill(3)(once(n))
      val warm = if (runs.exists(_._3.isDefined)) -1d else warmOnce(n)
      if (i % 10 == 9) {
        // Spark's ContextCleaner reclaims broadcast vars and shuffle files
        // only when the JVM GCs their references; 350+ plan executions in
        // one JVM accumulate enough debris that late queries measure the
        // backlog, not the plan (~2.5x on this host). An explicit GC every
        // 10 queries drains it outside any timed region.
        System.gc()
        noopAcc ++= noopSamples(2); noopShufAcc ++= noopShuffleSamples(1)
      }
      val ts = runs.map(_._1).sorted
      // steady-state job count = min across runs: the first run may pay
      // one-off jobs (lazy store build, cache population) that the median
      // time doesn't include; repeat runs of the same plan agree exactly
      (n, ts(1), runs.map(_._2).min, runs.flatMap(_._3).headOption, warm)
    }
    val failed = resultsAll.collect { case (n, _, _, Some(err), _) => (n, err) }
    val results = resultsAll.collect { case (n, sec, jobs, None, _) => n -> (sec, jobs) }
    val warmResults = resultsAll.collect {
      case (n, _, _, None, w) if w >= 0d => n -> w }
    noopAcc ++= noopSamples(5)
    noopShufAcc ++= noopShuffleSamples(5)
    val noopAll = noopAcc.toSeq.sorted
    val noop = noopAll(noopAll.size / 2)
    // minimum, not median, on both sides of the subtraction: the floors
    // drift 2x on this host and medians of the two distributions overlap,
    // while the minima are stable estimates of the true fixed cost
    val (shufT, shufJ) = noopShufAcc.minBy(_._1)
    val jobFloor =
      if (shufJ > 1) math.max((shufT - noopAll.head) / (shufJ - 1), 0d) else 0d
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val failedJson = failed.map { case (k, e) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val jobsJson = results.map { case (k, (_, j)) => "\"" + k + "\":" + j }
      .mkString("{", ",", "}")
    val warmJson = warmResults.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val totalJobs = results.map(_._2._2).sum
    val adjusted = total - noop * results.size
    // fixed cost subtracted analytically: per query (planning + first
    // job) plus the marginal job floor for each extra job — honest for
    // AQE/broadcast-heavy plans where adjusted_total (one floor per
    // query) understates the fixed overhead
    val adjustedJobs =
      total - noop * results.size -
        jobFloor * math.max(totalJobs - results.size, 0L)
    val ingestRps = if (ingestSec > 0) ingestRows / ingestSec else 0d
    // sustained sample: the wave bench's committed number swung 52-88k
    // rows/s on ±1 flush (each flush is one fixed-cost Spark job across
    // 96 posts — r11 verdict "what's wrong" #3). A 60-second closed-loop
    // run amortizes flush quantization to noise (±1 flush ≈ ±0.5%), so
    // consecutive runs agree within ±10% — and it doubles as the
    // sustained-throughput soak (same JVM state a long-lived server has)
    val (sRows, sSec) = ingestSustained(seconds = 60)
    val ingestRps2 = if (sSec > 0) sRows / sSec else 0d
    val comp = if (storeB > 0) rawB.toDouble / storeB else 0d
    val scanGbps =
      if (scanSec > 0) scanBytes / scanSec / (1L << 30).toDouble else 0d
    val calibEnd = calibrate()
    def calibJson(c: (Double, Double, Double)): String =
      f"""{"cpu_ms":${c._1}%.1f,"mt_cpu_ms":${c._2}%.1f,"io64m_ms":${c._3}%.1f}"""
    val calib = s"""{"start":${calibJson(calibStart)},"pre_ingest":${
      calibJson(calibPreIngest)},"end":${calibJson(calibEnd)}}"""
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","errors":${failed.size},"failed":$failedJson,"queries":$qs,"queries_warm":$warmJson,"jobs":$jobsJson,"total_jobs":$totalJobs,"sf":"$sfDir","overhead_per_query":$noop,"overhead_per_extra_job":$jobFloor,"adjusted_total":$adjusted,"adjusted_total_jobs":$adjustedJobs,"ingest_rows_per_sec":$ingestRps,"ingest_sustained_rows_per_sec":$ingestRps2,"ingest_sustained_rows":$sRows,"ingest_sustained_sec":$sSec,"ingest_rows":$ingestRows,"ingest_sec":$ingestSec,"ingest_posts":$ingestPosts,"ingest_flushes":$ingestFlushes,"ingest_raw_bytes":$rawB,"store_bytes":$storeB,"compression_ratio":$comp,"scan_bytes":$scanBytes,"scan_sec":$scanSec,"scan_gbps":$scanGbps,"server_lastn_ms":$lastnMs,"server_lastn_days_scanned":$lastnDays,"calib":$calib}"""
    println(fullJson)
    // the full result JSON is also WRITTEN to a file: the driver's
    // artifact capture has kept only a 2000-char stdout tail since r01
    // (BENCH_rNN.json "parsed": null in every round), so the complete
    // record must exist somewhere a tool can always read it whole
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/target/bench_out.json"),
      (fullJson + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] bench_out.json write failed: $e") }
    // driver-contract line, the minimal {"metric","value","unit","queries",
    // "sf"} record with per-query seconds rounded to 0.1ms so it stays as
    // small as the 141-name map allows (~3.5KB): a parser that scans whole
    // stdout for the LAST line carrying a "queries" map finds this one
    val qsShort = results.map { case (k, (v, _)) => f""""$k":$v%.4f""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsShort,"sf":"$sfDir"}""")
    // LAST line: compact totals (now contract-shaped too — "metric" is
    // "total" and "unit" present). The 2000-char tail capture always
    // contains this line whole, so a human or a tail-window parser reading
    // the artifact still gets every headline number even when the
    // per-query lines above were truncated away.
    println(s"""{"metric":"total","value":$total,"unit":"sec","adjusted":$adjustedJobs,"errors":${failed.size},"nq":${results.size},"total_jobs":$totalJobs,"overhead_per_query":$noop,"overhead_per_extra_job":$jobFloor,"ingest_rows_per_sec":$ingestRps,"ingest_sustained_rows_per_sec":$ingestRps2,"compression_ratio":$comp,"scan_gbps":$scanGbps,"server_lastn_ms":$lastnMs,"server_lastn_days_scanned":$lastnDays,"sf":"$sfDir","calib":$calib}""")
    // quiesce streaming state machinery BEFORE tearing down SparkEnv — the
    // StateStore maintenance thread otherwise races spark.stop() and logs
    // "SparkEnv not active" warnings into the bench tail
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Throwable => () }
    spark.stop()
  }

  /** Raw columnar scan bandwidth (BASELINE.md "track scan GB/s"): decode
    * EVERY column and fold into one hash-sum — a plain count()
    * short-circuits to parquet row-group metadata and measures nothing.
    * Two fixes over the naive version (round-6 verdict): (1) sf0.1
    * lineitem is ~11 MB on disk, so timing it measures the scheduler
    * floor, not bandwidth — materialize a >=512 MB (decompressed)
    * concatenation once (marker-guarded) and scan that; (2) report
    * DECOMPRESSED bytes (sum of column uncompressed sizes from the
    * parquet footers), which is what the decode path actually moves.
    * Median of 3 after a warmup pass. */
  /** Fixed-work environment calibration: (single-core CPU ms, all-core
    * CPU ms, 64 MiB write+fsync+read ms). The workloads are pinned
    * (splitmix64 mixing ×40M; one 64 MiB file on the bench cwd's
    * filesystem) so the numbers depend ONLY on the host's momentary
    * capacity — a contaminated run (concurrent sbt, page-cache churn,
    * noisy neighbor) shows up as calib drift and disqualifies its
    * throughput numbers from cross-round comparison. */
  private def calibrate(): (Double, Double, Double) = {
    val sink = new java.util.concurrent.atomic.AtomicLong
    def cpuOnce(): Unit = {
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < 40000000) {
        x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
        x ^= x >>> 27; x *= 0x94D049BB133111EBL
        x ^= x >>> 31
        i += 1
      }
      sink.addAndGet(x) // defeat dead-code elimination
    }
    cpuOnce() // JIT warmup
    val cpu = Seq.fill(3) {
      val t0 = System.nanoTime(); cpuOnce(); (System.nanoTime() - t0) / 1e6
    }.sorted.apply(1)
    val nT = Runtime.getRuntime.availableProcessors()
    val tMt0 = System.nanoTime()
    val threads = (0 until nT).map(_ => new Thread(() => cpuOnce()))
    threads.foreach(_.start()); threads.foreach(_.join())
    val mt = (System.nanoTime() - tMt0) / 1e6
    val io = {
      val fl = java.io.File.createTempFile("graft_calib_", ".bin",
        new java.io.File("."))
      try {
        val buf = new Array[Byte](1 << 20)
        new java.util.Random(42).nextBytes(buf)
        val t0 = System.nanoTime()
        val out = new java.io.FileOutputStream(fl)
        try {
          var i = 0
          while (i < 64) { out.write(buf); i += 1 }
          out.getFD.sync()
        } finally out.close()
        val in = new java.io.FileInputStream(fl)
        try {
          var n = in.read(buf)
          while (n >= 0) { sink.addAndGet(n.toLong); n = in.read(buf) }
        } finally in.close()
        (System.nanoTime() - t0) / 1e6
      } finally fl.delete()
    }
    (cpu, mt, io)
  }

  private def scanBench(spark: SparkSession, sfDir: String): (Long, Double) = {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    try {
      val hconf = spark.sessionState.newHadoopConf()
      def uncompressedBytes(p: String): Long = {
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(hconf)
        val files =
          if (fs.getFileStatus(path).isDirectory)
            fs.listStatus(path).filter(_.getPath.getName.endsWith(".parquet"))
          else Array(fs.getFileStatus(path))
        files.map { f =>
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, hconf))
          try r.getFooter.getBlocks.asScala
            .flatMap(_.getColumns.asScala).map(_.getTotalUncompressedSize).sum
          finally r.close()
        }.sum
      }
      val src = s"$sfDir/lineitem.parquet"
      val srcBytes = uncompressedBytes(src)
      val copies = math.max(1L, math.min(64L, (512L << 20) / math.max(srcBytes, 1L))).toInt
      val sf = new org.apache.hadoop.fs.Path(sfDir).getName
      val dir = s"/root/repo/target/graft_scanbench/v1/$sf"
      val srcFile = new java.io.File(src)
      val sig = s"${srcFile.length()}|${srcFile.lastModified()}|$copies"
      val sigFile = new java.io.File(s"$dir/_src_sig")
      val sigOk = sigFile.exists() &&
        new String(java.nio.file.Files.readAllBytes(sigFile.toPath), "UTF-8") == sig
      if (!new java.io.File(s"$dir/_SUCCESS").exists() || !sigOk) {
        val one = spark.read.parquet(src)
        Seq.fill(copies)(one).reduce(_ union _)
          .repartition(32).write.mode("overwrite").parquet(dir)
        java.nio.file.Files.write(sigFile.toPath, sig.getBytes("UTF-8"))
      }
      val bytes = uncompressedBytes(dir)
      val df = spark.read.parquet(dir)
      def run(): Unit =
        df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(bit_xor(col("h"))).collect() // xor: no ANSI sum overflow
      run() // warm
      // drain the ingest phase's GC debris outside the timed region —
      // measured 1.12s in-bench vs 0.50s isolated for the same scan
      System.gc()
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.sorted
      System.err.println(s"[bench] scan runs: ${ts.mkString(" ")} " +
        s"threads=${Thread.activeCount()}")
      (bytes, ts(1))
    } catch { case e: Exception =>
      // zeros in the JSON are indistinguishable from a measurement —
      // say why the series flatlined
      System.err.println(s"[bench] scanBench failed: $e")
      (0L, 0d)
    }
  }

  /** Ingest throughput: concurrent jsonline POSTs against the HTTP ingest
    * service (group-commit path), reported as sustained rows/s — the
    * reference's headline number (app/vlogsgenerator) — plus the
    * raw-jsonline-to-store compression ratio (columnar+zstd; the
    * reference claims >=10x, docs/victorialogs/README.md:132). Returns
    * (rows, seconds, posts, write-jobs, rawBytes, storeBytes). */
  /** Endpoint-level lastN rehearsal: `/select/logsql/query?limit=100`
    * over the events store — the day-descent tail path a dashboard pays.
    * Reports median request latency and the days-scanned pruning as
    * benched numbers (previously a ScalaTest-only assertion). */
  private def serverBench(spark: SparkSession, sfDir: String): (Double, Long) = {
    val dir = graft.store.LogStore.ensureFromEvents(spark, sfDir)
    val srv = new graft.server.QueryServer(spark,
      () => graft.store.LogStore.read(spark, dir), 0, storeDir = Some(dir))
    val port = srv.start()
    try {
      def one(): (Double, Long) = {
        val t0 = System.nanoTime()
        val conn = new java.net.URI(
          s"http://127.0.0.1:$port/select/logsql/query?query=%2A&limit=100")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        conn.getInputStream.readAllBytes()
        val ms = (System.nanoTime() - t0) / 1e6
        val days = Option(conn.getHeaderField("X-Graft-Days-Scanned"))
          .map(_.toLong).getOrElse(-1L)
        conn.disconnect()
        require(code == 200, s"lastN endpoint HTTP $code")
        (ms, days)
      }
      // THE designated serving-latency measurement (r12 verdict #5):
      // INGESTDET_r{N}'s consecutive-run pair of THIS median is the
      // committed headline; BENCH_r{N} carries the same measurement from
      // the same code path, so the two artifacts can only differ by
      // host noise, not by methodology. Robustness: 5 warmup calls (the
      // first call builds the store + plan; calls 2-5 still carry JIT),
      // then a GC settle, then a 21-call median — the r12 artifacts
      // committed 10.0 vs 5.8-6.4ms for the same HEAD because a 1-warmup
      // 15-call median taken on a freshly-built store kept compilation
      // tails inside the window.
      (1 to 5).foreach(_ => one())
      System.gc()
      Thread.sleep(100)
      val runs = Seq.fill(21)(one())
      (runs.map(_._1).sorted.apply(runs.size / 2), runs.map(_._2).max)
    } finally srv.stop()
  }

  /** Closed-loop sustained ingest: `threads` posters loop for `seconds`
    * of wall clock against a fresh store; returns (rows acked, elapsed).
    * Long-window throughput amortizes flush-count quantization — the
    * wave bench's dominant run-to-run variance — to <1%. */
  private def ingestSustained(seconds: Int, threads: Int = 16,
      linesPerPost: Int = 5000): (Long, Double) = {
    val spark = SparkSession.active
    val dir = s"/root/repo/target/bench_ingest_sus-${System.nanoTime()}"
    val srv = new graft.server.IngestServer(spark, dir)
    val port = srv.start()
    try {
      def post(body: Array[Byte]): Int = try {
        val conn = new java.net.URI(
          s"http://127.0.0.1:$port/insert/jsonline?_stream_fields=app")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.getOutputStream.write(body)
        val code = conn.getResponseCode
        (if (code >= 400) conn.getErrorStream else conn.getInputStream)
          .readAllBytes()
        conn.disconnect()
        code
      } catch { case e: java.io.IOException =>
        // a failed post must not ABORT the bench (a group-commit flush
        // stalled past the committer's 120s timeout under this host's
        // multi-minute disk stalls 400s the request, and the uncaught
        // IOException killed the whole run — every query timing lost).
        // It counts 0 acked rows, which keeps the throughput honest.
        System.err.println(s"[bench] sustained post failed: $e")
        -1
      }
      def body(i: Int): Array[Byte] = (0 until linesPerPost).map { j =>
        s"""{"_time":"2024-01-06T10:${f"${j % 60}%02d"}:00Z","_msg":"sustained ingest row $i $j","app":"app${i % 8}"}"""
      }.mkString("\n").getBytes("UTF-8")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      // warm wave (JIT + first-flush plan), outside the timed window
      (0 until threads).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = post(body(-1 - i)) })
      }.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      val acked = new java.util.concurrent.atomic.AtomicLong(0)
      val t0 = System.nanoTime()
      val deadline = t0 + seconds * 1000000000L
      val workers = (0 until threads).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = w
            while (System.nanoTime() < deadline) {
              if (post(body(i)) == 200) acked.addAndGet(linesPerPost.toLong)
              i += threads
            }
          }
        })
      }
      workers.foreach(_.get(seconds + 300L, java.util.concurrent.TimeUnit.SECONDS))
      val sec = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      (acked.get, sec)
    } finally {
      srv.stop()
      try {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(dir)
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: Throwable => }
    }
  }

  private def ingestBench(threads: Int = 16, posts: Int = 96,
      linesPerPost: Int = 5000): (Long, Double, Long, Long, Long, Long) = {
    val spark = SparkSession.active
    val dir = s"/root/repo/target/bench_ingest-${System.nanoTime()}"
    val srv = new graft.server.IngestServer(spark, dir)
    val port = srv.start()
    try {
      def post(body: Array[Byte]): Int = try {
        val conn = new java.net.URI(s"http://127.0.0.1:$port/insert/jsonline?_stream_fields=app")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.getOutputStream.write(body)
        val code = conn.getResponseCode
        (if (code >= 400) conn.getErrorStream else conn.getInputStream)
          .readAllBytes()
        conn.disconnect()
        code
      } catch { case e: java.io.IOException =>
        // see ingestSustained.post: a stalled flush must cost throughput
        // (0 acked rows), never abort the run and lose every timing
        System.err.println(s"[bench] ingest post failed: $e")
        -1
      }
      def body(i: Int): Array[Byte] = (0 until linesPerPost).map { j =>
        s"""{"_time":"2024-01-05T10:${f"${j % 60}%02d"}:00Z","_msg":"bench ingest row $i $j from generator","app":"app${i % 8}"}"""
      }.mkString("\n").getBytes("UTF-8")
      // warmup: one full concurrent wave, not a lone post — the lone post
      // leaves the multi-slice parse/shuffle/write path cold, so the first
      // timed flush paid ~1.8s of JIT that a sustained workload never sees
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      (0 until threads).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = post(body(-1 - i)) })
      }.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      val t0 = System.nanoTime()
      val futs = (0 until posts).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] { def call(): Int = post(body(i)) })
      }
      val ok = futs.map(_.get(300, java.util.concurrent.TimeUnit.SECONDS)).count(_ == 200)
      val sec = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      // raw payload bytes (incl. the warmup wave) vs what the store holds
      val rawBytes = (0 until posts).map(i => body(i).length.toLong).sum +
        (0 until threads).map(i => body(-1 - i).length.toLong).sum
      def du(f: java.io.File): Long =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
        else f.length()
      val storeBytes = du(new java.io.File(s"$dir/logs"))
      (ok.toLong * linesPerPost, sec, srv.committer.enqueued,
        srv.committer.flushes, rawBytes, storeBytes)
    } finally {
      srv.stop()
      // best-effort scratch cleanup
      try {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(dir)
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: Throwable => }
    }
  }
}
