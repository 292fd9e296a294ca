package graft.tools
import org.apache.spark.sql.SparkSession

/** Where does the fresh-execution floor go? Replicates the bench shape
  * (warm all queries once, then time fresh count() runs) while counting
  * ACTUAL Janino compilations via CodegenMetrics — if the compile count
  * keeps rising during the timed region, the 100-entry generated-class
  * cache is thrashing and every "fresh" run re-compiles its stages.
  * Env: SPARK_GRAFT_CODEGEN_CACHE (static conf; set before session). */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
    sys.env.get("SPARK_GRAFT_CODEGEN_CACHE").foreach { n =>
      b.config("spark.sql.codegen.cache.maxEntries", n)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"codegen.cache.maxEntries=" +
      spark.conf.getOption("spark.sql.codegen.cache.maxEntries").getOrElse("default"))

    def compileCount: Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
    def compileMs: Long = {
      val s = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getSnapshot
      (s.getMean * compileCount / 1e0).toLong // ms units already
    }

    // noop on the pristine session, before any query state accumulates
    def noopRaw(k: Int): Seq[Double] = Seq.fill(k) {
      val t = System.nanoTime(); spark.range(1).count(); (System.nanoTime()-t)/1e9
    }
    val pre = noopRaw(10).sorted
    println(f"noop PRE-warmup median=${pre(5)*1000}%.1fms min=${pre.head*1000}%.1fms")

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(graft.SparkEntry.isEffectful)
    val t0 = System.nanoTime()
    var warmFail = 0
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => warmFail += 1 }
    }
    println(f"warmup ${names.size} queries in ${(System.nanoTime()-t0)/1e9}%.1fs," +
      s" failures=$warmFail, compiles=$compileCount")

    def noop(k: Int): Seq[Double] = Seq.fill(k) {
      val t = System.nanoTime(); spark.range(1).count(); (System.nanoTime()-t)/1e9
    }
    // noop floor + compile delta during it
    val c0 = compileCount
    val n1 = noop(10).sorted
    println(f"noop median=${n1(5)*1000}%.1fms min=${n1.head*1000}%.1fms " +
      s"compiles_during=${compileCount - c0}")

    val targets = if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_substr", "q_dedup_ngram", "q_stream_context",
        "q_lql_facets", "q_agg_stats", "q_lql_in_subquery")
    targets.foreach { n =>
      val cc0 = compileCount
      val runs = Seq.fill(3) {
        val t = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime()-t)/1e9
      }.sorted
      println(f"$n%-22s median=${runs(1)*1000}%7.1fms min=${runs.head*1000}%7.1fms" +
        s" compiles_3runs=${compileCount - cc0}")
    }
    // total Janino time spent this JVM
    val snap = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    println(s"total_janino_compiles=${snap.getCount} mean_ms=${snap.getSnapshot.getMean}")
    spark.stop()
  }
}
