package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-field bloom sidecar scale probe (round-12 verdict ask #1's done
  * bar): (a) a 20M-row store with a realistic high-cardinality request-id
  * column — file-skip counts and wall time for needle phrase filters on
  * NON-`_msg` fields, bloom'd vs not; (b) BLOOMSCALE-style manifest
  * latency at 1k/16k files for the multi-field sidecar, on both the
  * cached-manifest and distributed-probe serving paths. Prints one JSON
  * line for FIELDBLOOM_r13.json. */
object FieldBloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCallSite("graft")
    import graft.store.{FieldBloom, LogStore, MsgBloom}
    import graft.logql.Compiler

    // ---- (a) 20M-row store with a per-row request id ------------------
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val dir = s"/root/repo/target/fieldbloom_scale/v1/rows$rows"
    if (!new java.io.File(s"$dir/logs/_SUCCESS").exists()) {
      val spanUs = 30L * 86400 * 1000000
      val startUs = 1704067200000000L
      val levels = array(Seq("info", "info", "info", "warn", "error").map(lit): _*)
      val df = spark.range(0, rows, 1, 64)
        .withColumn("_time",
          timestamp_micros(lit(startUs) + col("id") * lit(math.max(spanUs / rows, 1L))))
        .withColumn("level", element_at(levels, (pmod(xxhash64(col("id"), lit(1)), lit(5)) + 1).cast("int")))
        .withColumn("user_id", pmod(xxhash64(col("id"), lit(2)), lit(100000L)))
        .withColumn("req_id", format_string("%016x", xxhash64(col("id"), lit(9))))
        .withColumn("app", concat(lit("app"), pmod(xxhash64(col("id"), lit(4)), lit(16L))))
        .withColumn("_msg", format_string("handled request for user %d level %s",
          col("user_id"), col("level")))
        .select("_time", "_msg", "level", "user_id", "req_id", "app")
      val t0 = System.nanoTime()
      LogStore.ingest(df, dir, Seq("app"), filesPerDay = 8)
      graft.store.Compaction.optimize(spark, dir, minFilesToCompact = 2,
        skipAtTargetSize = true)
      println(f"[fieldbloom] store build ${(System.nanoTime() - t0) / 1e9}%.0fs")
    }
    val tBuild0 = System.nanoTime()
    FieldBloom.ensure(spark, dir)
    val buildS = (System.nanoTime() - tBuild0) / 1e9
    def du(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
      else f.length()
    val sidecarBytes = du(new java.io.File(s"$dir/field_bloom"))
    val storeBytes = du(new java.io.File(s"$dir/logs"))
    val totalFiles = LogStore.read(spark, dir).inputFiles.length
    println(s"[fieldbloom] covered=${FieldBloom.manifest(dir)} " +
      s"sidecar=${sidecarBytes / 1024 / 1024}MB files=$totalFiles")

    // a real row's req_id for the needle (deterministic store → stable)
    val needleReq = LogStore.read(spark, dir)
      .where(col("user_id") === 54321L).select("req_id")
      .orderBy("req_id").limit(1).collect().head.getString(0)

    def timeQuery(mk: () => org.apache.spark.sql.DataFrame): (Double, Double, Long) = {
      // cold = fresh DataFrame each run (the ad-hoc serving shape),
      // median of 5; warm = re-executing the same DataFrame, median of 5
      def med(ts: Seq[Double]) = ts.sorted.apply(ts.size / 2)
      var result = 0L
      val cold = Seq.fill(5) {
        val t = System.nanoTime()
        result = mk().collect().head.getLong(0)
        (System.nanoTime() - t) / 1e3 / 1e3
      }
      val df = mk()
      df.collect()
      val warm = Seq.fill(5) {
        val t = System.nanoTime()
        df.collect()
        (System.nanoTime() - t) / 1e3 / 1e3
      }
      (med(cold), med(warm), result)
    }

    val cases = Seq(
      ("req_needle", s"req_id:$needleReq | stats count() c"),
      ("user_needle", "user_id:54321 | stats count() c"),
      ("absent_needle", "req_id:ffffffffffffffffff0 | stats count() c"))
    val caseJson = cases.map { case (label, q) =>
      val tokens = FieldBloom.requiredTokensByField(
        graft.logql.Parser.parse(q, 0L).filter) - "_msg"
      val candidates = FieldBloom.candidateFiles(spark, dir, tokens)
        .map(_.size).getOrElse(-1)
      val (bloomCold, bloomWarm, r1) =
        timeQuery(() => MsgBloom.query(spark, dir, q))
      val (fullCold, fullWarm, r2) =
        timeQuery(() => Compiler.run(LogStore.read(spark, dir), q))
      require(r1 == r2, s"$label: bloom'd $r1 != full $r2")
      println(f"[fieldbloom] $label%13s files=$candidates/$totalFiles " +
        f"bloom cold=${bloomCold}%.0fms warm=${bloomWarm}%.0fms | " +
        f"full cold=${fullCold}%.0fms warm=${fullWarm}%.0fms rows_hit=$r1")
      s""""$label":{"candidate_files":$candidates,"total_files":$totalFiles,""" +
        s""""bloom_cold_ms":$bloomCold,"bloom_warm_ms":$bloomWarm,""" +
        s""""full_cold_ms":$fullCold,"full_warm_ms":$fullWarm,"rows":$r1}"""
    }

    // ---- (b) multi-field manifest latency at 1k / 16k files -----------
    def buildManyFiles(nFiles: Int): String = {
      val d = s"/root/repo/target/fieldbloom_scale/manifest/f$nFiles"
      if (!new java.io.File(s"$d/field_bloom/_SUCCESS").exists()) {
        val days = nFiles
        val n = nFiles.toLong * 3
        val df = spark.range(0, n, 1, 64)
          .withColumn("__day", (col("id") % days).cast("int"))
          .withColumn("_time", timestamp_micros(lit(1577836800000000L) +
            col("__day").cast("long") * 86400000000L + col("id")))
          .withColumn("app", concat(lit("a"), pmod(xxhash64(col("id")), lit(16L))))
          .withColumn("level", concat(lit("lv"), pmod(xxhash64(col("id"), lit(1)), lit(8L))))
          .withColumn("region", concat(lit("r"), pmod(xxhash64(col("id"), lit(2)), lit(64L))))
          .withColumn("code", pmod(xxhash64(col("id"), lit(3)), lit(500L)))
          .withColumn("_msg", lit("alpha beta gamma"))
          .select("_time", "_msg", "app", "level", "region", "code")
        LogStore.ingest(df, d, Seq("app"), filesPerDay = 16)
        FieldBloom.build(spark, d)
      }
      d
    }

    def measure(d: String, cap: String, label: String): (Double, Int) = {
      sys.props("graft.bloom.manifestCap") = cap
      def once(): Int =
        FieldBloom.candidateFiles(spark, d,
          Map("level" -> Seq("zeta-needle-absent"), "region" -> Seq("r3")))
          .map(_.size).getOrElse(-1)
      val n = once()
      val ts = Seq.fill(7) {
        val t = System.nanoTime(); once(); (System.nanoTime() - t) / 1e6
      }.sorted
      println(f"[fieldbloom] $label median=${ts(3)}%.1fms candidates=$n")
      (ts(3), n)
    }

    val manifestJson = Seq(1000, 16000).map { n =>
      val d = buildManyFiles(n)
      val bytes = du(new java.io.File(s"$d/field_bloom"))
      val total = LogStore.read(spark, d).inputFiles.length
      val fields = FieldBloom.manifest(d).size
      val (cachedMs, c1) = measure(d, String.valueOf(1L << 40), s"files=$total cached")
      val (distMs, c2) = measure(d, "0", s"files=$total distributed")
      require(c1 == c2, s"path results diverge: $c1 vs $c2")
      s""""files_$n":{"actual_files":$total,"covered_fields":$fields,""" +
        s""""sidecar_bytes":$bytes,"cached_manifest_ms":$cachedMs,""" +
        s""""distributed_probe_ms":$distMs,"candidates":$c1}"""
    }
    sys.props.remove("graft.bloom.manifestCap")

    println(s"""{"rows":$rows,"store_bytes":$storeBytes,""" +
      s""""sidecar_bytes":$sidecarBytes,"sidecar_build_s":$buildS,""" +
      s""""covered_fields":${FieldBloom.manifest(dir).size},""" +
      caseJson.mkString(",") + "," + manifestJson.mkString(",") + "}")
    spark.stop()
  }
}
