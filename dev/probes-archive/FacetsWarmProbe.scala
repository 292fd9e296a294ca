package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: where does q_store_facets' warm re-execution time go?
  * Times repeat collects of the SAME DataFrame and prints the job count
  * per collect plus the executed plan's leaf shapes. */
object FacetsWarmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCallSite("graft")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val df = graft.SparkEntry.queries("q_store_facets")(spark, d)
    df.collect() // materialize
    (0 until 30).foreach(_ => df.collect())
    (0 until 10).foreach { i =>
      val j0 = jobs.get
      val t0 = System.nanoTime()
      df.collect()
      println(f"[probe] warm collect $i: ${(System.nanoTime() - t0) / 1e6}%7.1f ms jobs=${jobs.get - j0}")
    }
    println(df.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(120)).take(40).mkString("\n"))
    spark.stop()
  }
}
