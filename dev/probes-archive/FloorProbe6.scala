package graft.tools
import org.apache.spark.sql.SparkSession

/** Interactive-path tuning matrix: shuffle partitions 1 vs 4, constraint
  * propagation, DPP/runtime-filter exclusion — fresh-count medians and
  * catalyst phase split per offender. */
object FloorProbe6 {
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
      "q_lql_collapse", "q_filter_range")

    def mkChild(sp: String, extra: Map[String, String]): SparkSession = {
      val s = spark.newSession()
      s.conf.set("spark.graft.interactive", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.shuffle.partitions", sp)
      s.conf.set("spark.sql.leafNodeDefaultParallelism", "1")
      s.conf.set("spark.sql.files.openCostInBytes", String.valueOf(256*1024))
      extra.foreach { case (k, v) => s.conf.set(k, v) }
      graft.functions.GraftFunctions.register(s)
      s
    }
    def bench(label: String, s: SparkSession): Unit = {
      s.range(1).count()
      names.foreach { n =>
        try {
          val mk = () => graft.SparkEntry.queries(n)(s, sfDir)
          mk().count(); mk().count()
          // catalyst phase split on a fresh count-shaped qe
          val agg = mk().groupBy().count()
          val qe = agg.queryExecution
          val tp0 = System.nanoTime(); qe.executedPlan
          val planMs = (System.nanoTime()-tp0)/1e6
          val ts = Seq.fill(5) {
            val t = System.nanoTime(); mk().count(); (System.nanoTime()-t)/1e6
          }.sorted
          println(f"[$label] $n%-22s med=${ts(2)}%7.1fms min=${ts.head}%7.1fms plan=${planMs}%6.1fms")
        } catch { case e: Throwable =>
          println(s"[$label] $n FAILED ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(150)}") }
      }
    }
    bench("sp1", mkChild("1", Map.empty))
    bench("sp4", mkChild("4", Map.empty))
    bench("sp4_nocons", mkChild("4", Map(
      "spark.sql.constraintPropagation.enabled" -> "false")))
    bench("sp4_lean", mkChild("4", Map(
      "spark.sql.constraintPropagation.enabled" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")))
    spark.stop()
  }
}
