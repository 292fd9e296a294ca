package graft.tools
import org.apache.spark.sql.SparkSession

/** Lever test for the fresh-execution floor: AQE on/off (runtime-
  * toggleable SQLConf), maxPlanStringLength, and top optimizer rules by
  * time for the plan-heavy queries. */
object FloorProbe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q_agg_stats", "q_dedup_substr", "q_dedup_ngram",
      "q_stream_context", "q_lql_facets", "q_lql_in_subquery")

    def bench(label: String): Unit = {
      // noop floor under current conf
      spark.range(1).count(); spark.range(1).count()
      val nt = Seq.fill(9) {
        val t = System.nanoTime(); spark.range(1).count(); (System.nanoTime()-t)/1e6
      }.sorted
      println(f"[$label] noop med=${nt(4)}%.1fms min=${nt.head}%.1fms")
      names.foreach { n =>
        val mk = () => graft.SparkEntry.queries(n)(spark, sfDir)
        mk().count(); mk().count()
        val ts = Seq.fill(5) {
          val t = System.nanoTime(); mk().count(); (System.nanoTime()-t)/1e6
        }.sorted
        println(f"[$label] $n%-22s med=${ts(2)}%7.1fms min=${ts.head}%7.1fms")
      }
    }
    bench("base")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    bench("aqe_off")
    spark.conf.set("spark.sql.maxPlanStringLength", "1024")
    bench("aqe_off+shortplan")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    bench("aqe_on+shortplan")
    spark.conf.unset("spark.sql.maxPlanStringLength")

    // optimizer rule hotspots for the big-tree queries
    Seq("q_dedup_substr", "q_dedup_ngram", "q_stream_context").foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val agg = df.groupBy().count()
      val qe = agg.queryExecution
      qe.executedPlan
      println(s"== $n top rules ==")
      qe.tracker.topRulesByTime(8).foreach { case (rule, s) =>
        println(f"  ${s.totalTimeNs/1e6}%7.1fms x${s.numInvocations} $rule")
      }
    }
    spark.stop()
  }
}
