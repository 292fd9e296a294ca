package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MsgBloom manifest-scale probe (round-12 verdict ask #9): needle-query
  * candidate pruning latency at 1k and 10k bloom'd files, measured on
  * BOTH serving paths — the ≤64 MiB in-driver manifest cache and the
  * distributed executor-side UDF probe (the 100 TB shape) — by moving
  * the cache cap (graft.bloom.manifestCap) around the sidecar size.
  * Prints one JSON line for BLOOMSCALE_r12.json. */
object BloomManifestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCallSite("graft")
    import graft.store.{LogStore, MsgBloom}

    def buildStore(nFiles: Int): String = {
      val dir = s"/root/repo/target/bloomscale/v1/f$nFiles"
      if (!new java.io.File(s"$dir/msg_bloom/_SUCCESS").exists()) {
        // one file per day at this toy volume (AQE coalesces the write
        // shuffle to a single task per day) → days = target file count
        val days = nFiles
        val rows = nFiles.toLong * 3
        val df = spark.range(0, rows, 1, 64)
          .withColumn("__day", (col("id") % days).cast("int"))
          .withColumn("_time", timestamp_micros(lit(1577836800000000L) +
            col("__day").cast("long") * 86400000000L + col("id")))
          .withColumn("app", concat(lit("a"), pmod(xxhash64(col("id")), lit(16L))))
          .withColumn("_msg", format_string("alpha beta%d gamma%d delta",
            pmod(xxhash64(col("id"), lit(1)), lit(500L)),
            pmod(xxhash64(col("id"), lit(2)), lit(500L))))
          .select("_time", "_msg", "app")
        LogStore.ingest(df, dir, Seq("app"), filesPerDay = 16)
        MsgBloom.build(spark, dir)
      }
      dir
    }

    def measure(dir: String, cap: String, label: String): (Double, Int) = {
      sys.props("graft.bloom.manifestCap") = cap
      // fresh signature check each call; warm once, median of 7
      def once(): Int =
        MsgBloom.candidateFiles(spark, dir, Seq("zeta-needle-absent"))
          .map(_.size).getOrElse(-1)
      val n = once()
      val ts = Seq.fill(7) {
        val t = System.nanoTime(); once(); (System.nanoTime() - t) / 1e6
      }.sorted
      println(f"[bloom] $label median=${ts(3)}%.1fms candidates=$n")
      (ts(3), n)
    }

    val out = Seq(1000, 10000).map { n =>
      val dir = buildStore(n)
      val sidecarBytes = Option(new java.io.File(s"$dir/msg_bloom")
        .listFiles()).getOrElse(Array.empty).filter(_.isFile).map(_.length).sum
      val total = LogStore.read(spark, dir).inputFiles.length
      val (cachedMs, c1) = measure(dir, String.valueOf(1L << 40), s"files=$total cached")
      val (distMs, c2) = measure(dir, "0", s"files=$total distributed")
      require(c1 == c2, s"path results diverge: $c1 vs $c2")
      s""""files_$n":{"actual_files":$total,"sidecar_bytes":$sidecarBytes,""" +
        s""""cached_manifest_ms":$cachedMs,"distributed_probe_ms":$distMs,""" +
        s""""candidates":$c1}"""
    }
    sys.props.remove("graft.bloom.manifestCap")
    println(s"""{${out.mkString(",")},"cap_default_bytes":${64L << 20}}""")
    spark.stop()
  }
}
