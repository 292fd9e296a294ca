package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Where do inter-stage driver gaps go? Listener timestamps: job start,
  * stage submit, first task launch, stage complete — for a minimal
  * 3-stage query, under conf variants. */
object StageGapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
    sys.env.get("SPARK_GRAFT_CONFS").foreach { cs =>
      cs.split(';').filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split('='); b.config(k, v) } }
    val spark0 = b.getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")
    case class Ev(kind: String, id: Long, t: Long)
    val evs = mutable.ArrayBuffer[Ev]()
    spark0.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        evs.synchronized { evs += Ev("job", e.jobId, e.time) }
      override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        evs.synchronized { evs += Ev("stageSub", e.stageInfo.stageId, e.stageInfo.submissionTime.getOrElse(0L)) }
      override def onTaskStart(e: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
        evs.synchronized { evs += Ev("task0:" + e.stageId, e.taskInfo.taskId, e.taskInfo.launchTime) }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        evs.synchronized { evs += Ev("stageDone", e.stageInfo.stageId, e.stageInfo.completionTime.getOrElse(0L)) }
    })
    def drain(): Unit = {
      val sc = spark0.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods.find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0).foreach(_.invoke(bus))
    }
    val spark = graft.Sessions.interactive(spark0)
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 50).select(col("doc_id"), col("text"))
    import graft.functions.Shingles.shingles
    val exploded = docs0.select(col("doc_id").as("id"),
      explode(shingles(col("text"), 3)).as("g"))
    val q = exploded.groupBy("g").agg(count(lit(1)).as("c"))
    (1 to 5).foreach(_ => q.count())
    drain(); evs.synchronized(evs.clear())
    val t0n = System.nanoTime(); val t0 = System.currentTimeMillis()
    q.count()
    val wall = (System.nanoTime()-t0n)/1e6
    drain()
    println(f"wall=${wall}%.1fms  events (ms since action start):")
    evs.synchronized {
      evs.sortBy(_.t).foreach { e =>
        println(f"  ${e.t - t0}%5dms ${e.kind} ${e.id}") }
    }
    spark0.stop()
  }
}
