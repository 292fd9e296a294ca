package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing probe for q_stream_context — not part of the engine. */
object CtxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    // warm the store
    graft.SparkEntry.queries("q_stream_context")(spark, d).count()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val times = (1 to 7).map { _ =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("q_stream_context")(spark, d)
      df.collect().foreach(r => ())
      (System.nanoTime() - t0) / 1e9
    }
    println(f"q_stream_context times: ${times.map(t => f"$t%.3f").mkString(", ")} jobs/run=${jobs.get / 7.0}")
    graft.SparkEntry.queries("q_stream_context")(spark, d).show(5, truncate = false)
    spark.stop()
  }
}
