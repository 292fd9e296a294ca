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
      // AQE stays on, as on a cluster: measured here, its partition
      // coalescing wins more than its per-stage re-planning costs
      // (iterative connected-components is 3x slower without it)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ingest first: it measures sustained request→commit throughput, which
    // a JVM full of 100+ queries' codegen classes and GC debris understates
    // by 3-4x versus the same code on a warm-but-clean session
    val (ingestRows, ingestSec, ingestPosts, ingestFlushes, rawB, storeB) =
      ingestBench()
    val (scanBytes, scanSec) = scanBench(spark, sfDir)
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
    def once(name: String): (Double, Long) = {
      drainListenerBus()
      val j0 = jobCounter.get
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => return (-1d, 0L) }
      val sec = (System.nanoTime() - t0) / 1e9
      drainListenerBus()
      (sec, jobCounter.get - j0)
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
    def noopSamples(k: Int): Seq[Double] = Seq.fill(k) {
      val t0 = System.nanoTime()
      spark.range(1).count()
      (System.nanoTime() - t0) / 1e9
    }
    // marginal JOB floor, separate from the per-query floor: a query's
    // fixed cost is (planning + first job) + (jobs-1) × marginal-job.
    // Subtracting the full noop per job over-subtracts (the noop includes
    // planning, which multi-job queries pay once) — measured here as the
    // time delta between a shuffling noop (multi-job under AQE) and the
    // plain one, divided by the extra jobs it runs.
    def noopShuffleSamples(k: Int): Seq[(Double, Long)] = Seq.fill(k) {
      drainListenerBus()
      val j0 = jobCounter.get
      val t0 = System.nanoTime()
      spark.range(2).repartition(2).count()
      val sec = (System.nanoTime() - t0) / 1e9
      drainListenerBus()
      (sec, jobCounter.get - j0)
    }
    val noopAcc = scala.collection.mutable.ArrayBuffer[Double]()
    val noopShufAcc = scala.collection.mutable.ArrayBuffer[(Double, Long)]()
    noopAcc ++= noopSamples(5)
    noopShufAcc ++= noopShuffleSamples(5)
    val results = names.zipWithIndex.map { case (n, i) =>
      val runs = Seq.fill(3)(once(n))
      if (i % 10 == 9) { noopAcc ++= noopSamples(2); noopShufAcc ++= noopShuffleSamples(1) }
      val ts = runs.map(_._1).sorted
      // steady-state job count = min across runs: the first run may pay
      // one-off jobs (lazy store build, cache population) that the median
      // time doesn't include; repeat runs of the same plan agree exactly
      n -> (ts(1), runs.map(_._2).min)
    }
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
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val jobsJson = results.map { case (k, (_, j)) => "\"" + k + "\":" + j }
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
    val comp = if (storeB > 0) rawB.toDouble / storeB else 0d
    val scanGbps =
      if (scanSec > 0) scanBytes / scanSec / (1L << 30).toDouble else 0d
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"jobs":$jobsJson,"total_jobs":$totalJobs,"sf":"$sfDir","overhead_per_query":$noop,"overhead_per_extra_job":$jobFloor,"adjusted_total":$adjusted,"adjusted_total_jobs":$adjustedJobs,"ingest_rows_per_sec":$ingestRps,"ingest_rows":$ingestRows,"ingest_sec":$ingestSec,"ingest_posts":$ingestPosts,"ingest_flushes":$ingestFlushes,"ingest_raw_bytes":$rawB,"store_bytes":$storeB,"compression_ratio":$comp,"scan_bytes":$scanBytes,"scan_sec":$scanSec,"scan_gbps":$scanGbps}""")
    spark.stop()
  }

  /** Raw columnar scan bandwidth (BASELINE.md "track scan GB/s"): decode
    * EVERY column of the largest table and fold it into one hash-sum —
    * a plain count() short-circuits to parquet row-group metadata and
    * measures nothing. Reported as on-disk (compressed) bytes per second,
    * median of 3 after a warmup pass. */
  private def scanBench(spark: SparkSession, sfDir: String): (Long, Double) = {
    import org.apache.spark.sql.functions._
    try {
      val path = s"$sfDir/lineitem.parquet"
      val bytes = new java.io.File(path).length
      val df = spark.read.parquet(path)
      def run(): Unit =
        df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(bit_xor(col("h"))).collect() // xor: no ANSI sum overflow
      run() // warm
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.sorted
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
  private def ingestBench(threads: Int = 16, posts: Int = 48,
      linesPerPost: Int = 5000): (Long, Double, Long, Long, Long, Long) = {
    val spark = SparkSession.active
    val dir = s"/root/repo/target/bench_ingest-${System.nanoTime()}"
    val srv = new graft.server.IngestServer(spark, dir)
    val port = srv.start()
    try {
      def post(body: Array[Byte]): Int = {
        val conn = new java.net.URI(s"http://127.0.0.1:$port/insert/jsonline?_stream_fields=app")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.getOutputStream.write(body)
        val code = conn.getResponseCode
        conn.getInputStream.readAllBytes(); conn.disconnect()
        code
      }
      def body(i: Int): Array[Byte] = (0 until linesPerPost).map { j =>
        s"""{"_time":"2024-01-05T10:${f"${j % 60}%02d"}:00Z","_msg":"bench ingest row $i $j from generator","app":"app${i % 8}"}"""
      }.mkString("\n").getBytes("UTF-8")
      post(body(-1)) // warmup: first append pays parquet/committer init
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futs = (0 until posts).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] { def call(): Int = post(body(i)) })
      }
      val ok = futs.map(_.get(300, java.util.concurrent.TimeUnit.SECONDS)).count(_ == 200)
      val sec = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      // raw payload bytes (incl. the warmup post) vs what the store holds
      val rawBytes = (0 until posts).map(i => body(i).length.toLong).sum +
        body(-1).length.toLong
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
