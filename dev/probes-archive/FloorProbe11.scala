package graft.tools
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Interleaved config A/B for the interactive session: (shuffle
  * partitions, maxPartitionBytes) on fresh-count medians of all matched
  * offenders. Rounds alternate configs to neutralize JIT/debris drift. */
object FloorProbe11 {
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
    def mkChild(sp: String, mpb: Long): SparkSession = {
      val s = spark.newSession()
      s.conf.set("spark.graft.interactive", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.shuffle.partitions", sp)
      s.conf.set("spark.sql.leafNodeDefaultParallelism", "1")
      s.conf.set("spark.sql.files.maxPartitionBytes", String.valueOf(mpb))
      s.conf.set("spark.sql.files.openCostInBytes", String.valueOf(256*1024))
      s.conf.set("spark.sql.constraintPropagation.enabled", "false")
      s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      s.conf.set("spark.sql.maxPlanStringLength", "4096")
      graft.functions.GraftFunctions.register(s)
      s
    }
    val configs = Seq(
      "sp8_mpb8M"   -> mkChild("8",  8L<<20),
      "sp16_mpb512K"-> mkChild("16", 512L<<10),
      "sp32_mpb512K"-> mkChild("32", 512L<<10),
      "sp16_mpb2M"  -> mkChild("16", 2L<<20))
    val names = Seq("q_agg_stats", "q_stream_context", "q_lql_sort_prank",
      "q_dedup_substr", "q_dedup_substr_chars", "q_dedup_ngram",
      "q_lql_collapse", "q_lql_ip_bucket", "q_filter_range",
      "q_text_bm25", "q_text_stats", "q_decontaminate", "q_lql_histogram")
    // warm every (config, query) twice
    configs.foreach { case (_, s) => names.foreach { n =>
      graft.SparkEntry.queries(n)(s, sfDir).count()
      graft.SparkEntry.queries(n)(s, sfDir).count() } }
    val res = mutable.Map[(String,String), mutable.ArrayBuffer[Double]]()
    (1 to 5).foreach { _ =>
      configs.foreach { case (cl, s) =>
        names.foreach { n =>
          val t = System.nanoTime()
          graft.SparkEntry.queries(n)(s, sfDir).count()
          res.getOrElseUpdate((cl,n), mutable.ArrayBuffer()) += (System.nanoTime()-t)/1e6
        }
      }
      System.gc()
    }
    println(f"${"query"}%-22s ${configs.map(_._1).map(c => f"$c%14s").mkString}")
    names.foreach { n =>
      val cells = configs.map { case (cl,_) => res((cl,n)).min }
      println(f"$n%-22s ${cells.map(v => f"$v%14.1f").mkString}")
    }
    spark.stop()
  }
}
