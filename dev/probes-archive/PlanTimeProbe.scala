package graft.tools
import org.apache.spark.sql.SparkSession

/** Where does a tiny-input dedup query's wall time go — Catalyst
  * analysis/optimization of the big expression tree, or execution?
  * Times plan materialization and action separately, warm, per query. */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_ngram", "q_decontaminate", "q_dedup_substr",
        "q_stream_context", "q_lql_collapse", "q_lql_sort_prank")
    // warmup everything once
    names.foreach(n => graft.SparkEntry.queries(n)(spark, sfDir).count())
    names.foreach { n =>
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        ((t1-t0)/1e6, (t2-t1)/1e6, (t3-t2)/1e6)
      }
      val m = runs.sortBy(r => r._1+r._2+r._3).apply(1)
      println(f"$n%-22s build=${m._1}%7.1fms plan=${m._2}%7.1fms exec=${m._3}%7.1fms")
    }
    spark.stop()
  }
}
