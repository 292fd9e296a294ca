package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Per-task executorRunTime for minimal reduce stages on the interactive
  * session: plain count vs collect_list vs CappedIds vs with array_sort. */
object TaskCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")
    val taskMs = mutable.ArrayBuffer[(Int, Long)]()
    spark0.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskMs.synchronized { taskMs += ((e.stageId, e.taskMetrics.executorRunTime)) }
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
    def run(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.count(); df.count(); df.count()
      drain(); taskMs.synchronized(taskMs.clear())
      val t = System.nanoTime(); df.count()
      val wall = (System.nanoTime()-t)/1e6
      drain()
      val by = taskMs.synchronized(taskMs.groupBy(_._1).map { case (s, ts) =>
        f"s$s:${ts.size}t/max${ts.map(_._2).max}ms/sum${ts.map(_._2).sum}ms" }.toSeq.sorted)
      println(f"$label%-28s wall=${wall}%7.1f  ${by.mkString(" ")}")
    }
    run("groupBy_count")(exploded.groupBy("g").agg(count(lit(1)).as("c")))
    run("collect_list")(exploded.groupBy("g").agg(collect_list(col("id")).as("ids")))
    run("cappedids")(exploded.groupBy("g")
      .agg(graft.functions.CappedIds.idsWithCount(col("id"), 10001).as("r")))
    run("cappedids+sort")(exploded.groupBy("g")
      .agg(graft.functions.CappedIds.idsWithCount(col("id"), 10001).as("r"))
      .select(array_sort(col("r._1")).as("ids")))
    spark0.stop()
  }
}
