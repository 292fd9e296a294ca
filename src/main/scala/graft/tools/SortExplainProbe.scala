package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import scala.collection.mutable

/** One-off: per-stage task-metric breakdown of warm re-execution for the
  * q_lql_uniq shape (globalSort path debugging). */
object SortExplainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stageTasks = mutable.Map[Int, (Int, Long, Long)]() // n, cpuMs, recs
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
        val m = te.taskMetrics
        if (m != null) {
          val (n, cpu, recs) = stageTasks.getOrElse(te.stageId, (0, 0L, 0L))
          stageTasks(te.stageId) = (n + 1, cpu + m.executorCpuTime / 1000000,
            recs + m.shuffleReadMetrics.recordsRead + m.inputMetrics.recordsRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def timeWarm(label: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      val df = mk
      df.collect()
      df.collect() // settle
      synchronized { stageTasks.clear() }
      val t0 = System.nanoTime(); df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val st = synchronized { stageTasks.toSeq.sortBy(_._1) }
      println(f"VARIANT $label%-32s warm=${sec}%.3f stages=" +
        st.map { case (id, (n, cpu, recs)) => s"[$id:${n}t,${cpu}ms,${recs}r]" }
          .mkString(" "))
    }

    def uniq = graft.logql.Compiler.run(
      graft.Tables.eventsLog(spark, sfDir),
      "event_type:in(error, signup) | uniq by (event_type, user_id) with hits")

    timeWarm("uniq_alone", uniq)
    timeWarm("uniq_coalesce1_plainsort",
      uniq.coalesce(1).sortWithinPartitions(col("event_type"), col("user_id")))
    timeWarm("uniq_repart1_plainsort",
      uniq.repartition(1).sortWithinPartitions(col("event_type"), col("user_id")))
    def collation = Seq(
      when(coalesce(col("event_type"), lit("")) === "", 0)
        .when(expr("try_cast(event_type as double)").isNotNull, 1).otherwise(2).asc,
      coalesce(expr("try_cast(event_type as double)"), lit(0.0)).asc,
      coalesce(col("event_type"), lit("")).asc, col("user_id").asc)
    timeWarm("uniq_repart1_collation",
      uniq.repartition(1).sortWithinPartitions(collation: _*))
    timeWarm("uniq_coalesce1_collation",
      uniq.coalesce(1).sortWithinPartitions(collation: _*))
    timeWarm("full_q_lql_uniq",
      graft.SparkEntry.queries("q_lql_uniq")(spark, sfDir))
  }
}
