package graft.tools
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-section job/task attribution + per-task max durations for the
  * first execution of a fresh plan instance. */
object FloorProbe10 {
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
    val taskMs = mutable.ArrayBuffer[(Int, Long, Long)]() // stage, runMs, deserMs
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskMs.synchronized { taskMs += ((e.stageId,
          e.taskMetrics.executorRunTime, e.taskMetrics.executorDeserializeTime)) }
    })
    def drain(): Unit = {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods.find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0).foreach(_.invoke(bus))
    }
    val names = if (args.nonEmpty) args.toSeq else
      Seq("q_lql_ip_bucket", "q_dedup_ngram", "q_dedup_substr")
    names.foreach { n =>
      (1 to 8).foreach(_ => graft.SparkEntry.queries(n)(spark, sfDir).count())
      drain()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val agg = df.groupBy().count()
      val qe = agg.queryExecution
      qe.executedPlan
      drain(); val j0 = jobs.get
      taskMs.synchronized(taskMs.clear())
      val tA = System.nanoTime()
      val rdd = qe.toRdd
      val tB = System.nanoTime(); drain(); val jToRdd = jobs.get - j0
      val tB2 = System.nanoTime()
      rdd.count()
      val tC = System.nanoTime(); drain()
      val byStage = taskMs.synchronized(taskMs.groupBy(_._1).map { case (s, ts) =>
        (s, ts.size, ts.map(_._2).max, ts.map(_._2).sum, ts.map(_._3).max) }.toSeq.sortBy(_._1))
      println(f"$n%-18s toRdd=${(tB-tA)/1e6}%7.1fms (jobs=$jToRdd) job1=${(tC-tB2)/1e6}%7.1fms")
      byStage.foreach { case (s, cnt, mx, sm, dmx) =>
        println(f"   stage $s%5d tasks=$cnt%3d maxRun=${mx}%4dms sumRun=${sm}%5dms maxDeser=${dmx}%4dms") }
    }
    spark.stop()
  }
}
