package graft.tools

import org.apache.spark.sql.SparkSession

/** Labeled diagnostic: time named SparkEntry queries and dump their
  * formatted plans (dev aid for the bench hot-spot hunt). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val showPlan = sys.env.contains("GRAFT_PLAN")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warmup
      fn(spark, sfDir).count()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"TIME $name%-28s median=${ts(1)}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      if (showPlan) println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
