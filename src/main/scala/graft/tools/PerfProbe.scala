package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing probe for matched-work bench stragglers — not part of the engine. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // optional interactive-session overrides for A/B runs
    sys.env.get("SPARK_GRAFT_ISP").foreach(v =>
      spark.conf.set("spark.graft.interactive.shufflePartitions", v))
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1) match {
      case a if a.nonEmpty => a.toSeq
      case _ => Seq("q_lql_unpack_json", "q_sim_topk", "q_lql_sort_prank", "q_quantile", "q_text_fingerprint", "q_text_perplexity")
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    // SPARK_GRAFT_WARM=1: time collect() on the memoized Dataset — the
    // plan-cache re-execution shape (serving path / bench queries_warm),
    // where upstream exchanges are skipped stages. Default times count():
    // a fresh Dataset per run, full re-execution (bench fresh numbers).
    val warmMode = sys.env.get("SPARK_GRAFT_WARM").contains("1")
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, d).collect() // warm
      val j0 = jobs.get
      val times = (1 to 9).map { _ =>
        val t0 = System.nanoTime()
        if (warmMode) graft.SparkEntry.queries(n)(spark, d).collect()
        else graft.SparkEntry.queries(n)(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-22s ${times.map(t => f"$t%.3f").mkString(", ")}  jobs/run=${(jobs.get - j0).toDouble / times.size}")
    }
    spark.stop()
  }
}
