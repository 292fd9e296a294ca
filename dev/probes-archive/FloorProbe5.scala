package graft.tools
import org.apache.spark.sql.SparkSession

/** Per-job floor vs local-mode thread count, and small-path shape
  * (AQE off + 1 shuffle partition) on the offender queries. */
object FloorProbe5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val threads = sys.env.getOrElse("SPARK_GRAFT_THREADS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rdd = spark.sparkContext.parallelize(1 to 1, 1)
    (1 to 20).foreach(_ => rdd.count())
    val ts = (1 to 50).map { _ =>
      val t = System.nanoTime(); rdd.count(); (System.nanoTime()-t)/1e6
    }.sorted
    println(f"threads=$threads rdd1: min=${ts.head}%.2f med=${ts(25)}%.2f")

    // small child session: AQE off, 1 shuffle partition
    val small = spark.newSession()
    small.conf.set("spark.sql.adaptive.enabled", "false")
    small.conf.set("spark.sql.shuffle.partitions", "1")
    def benchOn(label: String, s: SparkSession): Unit = {
      val names = Seq("q_agg_stats", "q_dedup_substr", "q_dedup_ngram",
        "q_stream_context", "q_lql_facets", "q_lql_in_subquery")
      s.range(1).count()
      names.foreach { n =>
        val mk = () => graft.SparkEntry.queries(n)(s, sfDir)
        try {
          mk().count(); mk().count()
          val ts = Seq.fill(5) {
            val t = System.nanoTime(); mk().count(); (System.nanoTime()-t)/1e6
          }.sorted
          println(f"[$label] $n%-22s med=${ts(2)}%7.1fms min=${ts.head}%7.1fms")
        } catch { case e: Throwable =>
          println(s"[$label] $n FAILED: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}") }
      }
    }
    benchOn("main", spark)
    benchOn("small", small)
    spark.stop()
  }
}
