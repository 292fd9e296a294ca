package graft.tools
import org.apache.spark.sql.SparkSession

/** Phase-level breakdown of the fresh-execution floor: Catalyst phase
  * timings (QueryExecution.tracker), task/stage counts, and noop-shape
  * variants, to locate the ~100ms spark.range(1).count() floor. */
object FloorProbe2 {
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
    val taskCounter = new java.util.concurrent.atomic.AtomicLong(0)
    val stageCounter = new java.util.concurrent.atomic.AtomicLong(0)
    val jobCounter = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskCounter.incrementAndGet()
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stageCounter.incrementAndGet()
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCounter.incrementAndGet()
    })
    def drain(): Unit = try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .foreach(_.invoke(bus))
    } catch { case _: Exception => Thread.sleep(30) }

    def timed(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      // warm twice
      mk.count(); mk.count()
      val runs = Seq.fill(5) {
        drain()
        val t0 = taskCounter.get; val s0 = stageCounter.get; val j0 = jobCounter.get
        val t = System.nanoTime()
        val df = mk
        val agg = df.groupBy().count()
        val qe = agg.queryExecution
        val tPlan0 = System.nanoTime()
        qe.executedPlan
        val tPlan1 = System.nanoTime()
        agg.collect()
        val tEnd = System.nanoTime()
        drain()
        val phases = qe.tracker.phases.map { case (k, v) =>
          s"$k=${v.endTimeMs - v.startTimeMs}ms" }.mkString(" ")
        ((tEnd-t)/1e6, (tPlan1-tPlan0)/1e6, (tEnd-tPlan1)/1e6, phases,
          taskCounter.get-t0, stageCounter.get-s0, jobCounter.get-j0)
      }
      val m = runs.sortBy(_._1).apply(2)
      println(f"$label%-28s total=${m._1}%7.1fms plan=${m._2}%6.1fms exec=${m._3}%7.1fms tasks=${m._5} stages=${m._6} jobs=${m._7}  ${m._4}")
    }

    // pure-RDD job: isolates DAGScheduler+task cost from the SQL layer
    def rddTimed(label: String, slices: Int): Unit = {
      val rdd = spark.sparkContext.parallelize(1 to slices, slices)
      rdd.count(); rdd.count()
      val runs = Seq.fill(5) {
        drain()
        val t = System.nanoTime(); rdd.count(); val d = (System.nanoTime()-t)/1e6
        drain(); d
      }.sorted
      println(f"$label%-28s total=${runs(2)}%7.1fms (rdd, $slices tasks)")
    }
    rddTimed("rdd_1task", 1)
    rddTimed("rdd_32task", 32)

    import org.apache.spark.sql.functions._
    timed("range1")(spark.range(1).toDF)
    timed("range1_1slice")(spark.range(0, 1, 1, 1).toDF)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_agg_stats", "q_dedup_substr", "q_dedup_ngram",
        "q_stream_context", "q_lql_facets", "q_lql_in_subquery")
    names.foreach { n =>
      timed(n)(graft.SparkEntry.queries(n)(spark, sfDir))
    }
    spark.stop()
  }
}
