package graft.tools
import org.apache.spark.sql.SparkSession

/** Does serving the memo's OPTIMIZED plan cut fresh-count cost?
  * A/B interleaved in one JVM: count() on the routed df vs count() on
  * PlanDataset.ofRows(optimizedPlan). Min-of-7 per arm. */
object FloorProbe7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q_agg_stats", "q_stream_context", "q_lql_sort_prank",
      "q_dedup_substr", "q_dedup_substr_chars", "q_dedup_ngram",
      "q_lql_collapse", "q_lql_ip_bucket", "q_filter_range")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir) // routed
      val pre = org.apache.spark.sql.graft.PlanDataset.ofRows(
        df.sparkSession, df.queryExecution.optimizedPlan)
      df.count(); pre.count(); df.count(); pre.count()
      val (as, bs) = (collection.mutable.ArrayBuffer[Double](),
        collection.mutable.ArrayBuffer[Double]())
      (1 to 7).foreach { _ =>
        var t = System.nanoTime(); df.count(); as += (System.nanoTime()-t)/1e6
        t = System.nanoTime(); pre.count(); bs += (System.nanoTime()-t)/1e6
      }
      println(f"$n%-22s raw_min=${as.min}%7.1f raw_med=${as.sorted.apply(3)}%7.1f  pre_min=${bs.min}%7.1f pre_med=${bs.sorted.apply(3)}%7.1f")
    }
    spark.stop()
  }
}
