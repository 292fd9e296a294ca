package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal: build a deterministic events-like store ~200× the
  * sf0.1 fixture (default 20M rows over 30 days, 16 streams) through the
  * REAL ingest path (LogStore.ingest → day-partitioned zstd parquet →
  * compaction), then time the flagship query shapes against it. The
  * point is evidence, not a benchmark record: partition pruning must
  * actually skip days, WindowGroupLimit must hold a partitioned rank
  * bound, stream filters must prune via the promoted columns — the
  * behaviors the 100 TB design claims, demonstrated at a scale where a
  * de-optimized plan visibly blows up. Generation is hash-based and
  * fully deterministic.
  *
  * Usage: runMain graft.tools.ScaleProbe [rows] (default 20000000)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.store.LogStore
    import graft.logql.Compiler

    val dir = s"/root/repo/target/graft_scale/v1/rows$rows"
    val t0 = System.nanoTime()
    if (!new java.io.File(s"$dir/logs/_SUCCESS").exists()) {
      // 30 days of events, evenly spread; every column derives from the
      // row index via xxhash64, so the store is reproducible bit-for-bit
      val spanUs = 30L * 86400 * 1000000
      val startUs = 1704067200000000L // 2024-01-01T00:00:00Z
      val types = array(Seq("view", "click", "purchase", "error", "signup").map(lit): _*)
      val df = spark.range(0, rows, 1, 64)
        .withColumn("_time", // per-row step precomputed: id*spanUs overflows Long
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
      println(f"SCALE build phase: ingest ${tIngest}%.0fs")
      graft.store.Compaction.optimize(spark, dir, minFilesToCompact = 2,
        skipAtTargetSize = true)
      println(f"SCALE build phase: compact ${(System.nanoTime() - t0) / 1e9 - tIngest}%.0fs")
    }
    val buildSec = (System.nanoTime() - t0) / 1e9

    def du(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
      else f.length()
    val storeBytes = du(new java.io.File(s"$dir/logs"))

    val logs = LogStore.read(spark, dir)
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
    shapes.foreach { case (name, q) =>
      Compiler.run(logs, q).collect() // warm (footer/codegen)
      val times = (1 to 3).map { _ =>
        val s = System.nanoTime()
        Compiler.run(logs, q).collect()
        (System.nanoTime() - s) / 1e9
      }.sorted
      val mrps = rows / 1e6 / times(1)
      println(f"SCALE $name%-14s median=${times(1)}%.2fs  ($mrps%.0f M rows/s)")
    }
    println(f"SCALE store: $rows rows, ${storeBytes / 1e6}%.0f MB on disk " +
      f"(${rows.toDouble * 60 / storeBytes}%.1fx vs ~60B/row raw), build ${buildSec}%.0fs")
    spark.stop()
  }
}
