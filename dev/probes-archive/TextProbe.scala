package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing probe for q_text_stats — not part of the engine. */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.SparkEntry.queries("q_text_stats")(spark, d).collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val times = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_text_stats")(spark, d).collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"q_text_stats times: ${times.map(t => f"$t%.3f").mkString(", ")} jobs/run=${jobs.get / 5.0}")
    // split build cost from execution cost
    val dfB0 = System.nanoTime()
    val df = graft.SparkEntry.queries("q_text_stats")(spark, d)
    val built = (System.nanoTime() - dfB0) / 1e9
    val e0 = System.nanoTime()
    df.collect()
    println(f"build=${built}%.3f exec=${(System.nanoTime() - e0) / 1e9}%.3f")
    df.show(10, truncate = false)
    spark.stop()
  }
}
