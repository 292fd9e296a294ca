package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query job/stage/task census for tiny-input latency hunting:
  * is the warm execution time stage-count latency or task-count latency? */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        taskMs.addAndGet(t.taskInfo.duration)
    })
    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_ngram", "q_stream_context", "q_lql_collapse")
    names.foreach(n => graft.SparkEntry.queries(n)(spark, sfDir).count())
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.executedPlan
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      df.count()
      val ms = (System.nanoTime() - t0) / 1e6
      Thread.sleep(200)
      println(f"$n%-22s exec=$ms%7.1fms jobs=${jobs.get}%2d stages=${stages.get}%3d tasks=${tasks.get}%4d taskTime=${taskMs.get}%6dms")
    }
    spark.stop()
  }
}
