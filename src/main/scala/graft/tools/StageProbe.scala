package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Scratch stage-level profiler — not part of the engine. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val name = args.headOption.getOrElse("q_text_perplexity")
    graft.SparkEntry.queries(name)(spark, d).collect() // warm
    graft.SparkEntry.queries(name)(spark, d).collect() // warm 2
    val stages = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages += ((si.stageId, dur, si.numTasks, si.name.take(80)))
      }
    })
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, d).collect()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"$name wall=$wall%.3f")
    stages.foreach { case (id, dur, nt, n) => println(f"  stage $id%3d ${dur}ms tasks=$nt $n") }
    spark.stop()
  }
}
