package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Per-stage wall/task detail for one query — where do serial-chain
  * milliseconds go? Scratch probe, not part of the engine. */
object StageDetailProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args.headOption.getOrElse("q_dedup_ngram")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var t0 = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        rows.add(f"  job ${j.jobId}%3d start @${(System.nanoTime()-t0)/1e6}%7.1fms stages=${j.stageIds.size}")
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        rows.add(f"  job ${j.jobId}%3d end   @${(System.nanoTime()-t0)/1e6}%7.1fms")
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val wall = for {a <- si.completionTime; b <- si.submissionTime} yield a - b
        rows.add(f"    stage ${si.stageId}%3d ${si.name.take(60)}%-60s tasks=${si.numTasks}%3d wall=${wall.getOrElse(-1L)}%5dms")
      }
    })
    // warm twice
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    Thread.sleep(300); rows.clear()
    t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val tB = System.nanoTime()
    df.queryExecution.executedPlan
    val tP = System.nanoTime()
    df.count()
    val tE = System.nanoTime()
    Thread.sleep(400)
    println(f"$name build=${(tB-t0)/1e6}%.1fms plan=${(tP-tB)/1e6}%.1fms exec=${(tE-tP)/1e6}%.1fms")
    rows.forEach(println)
    spark.stop()
  }
}
