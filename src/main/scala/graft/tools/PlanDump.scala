package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the plans/r14/<query>_{before,after}.txt artifacts. Usage:
  *   runMain graft.tools.PlanDump <outDir> <suffix> [query ...]
  * (no query names = every declared query). Not part of the engine. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/root/repo/plans/r14")
    val suffix = args.lift(1).getOrElse("before")
    val names = args.drop(2) match {
      case a if a.nonEmpty => a.toSeq
      case _ => graft.SparkEntry.queries.keys.toSeq.sorted
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, d)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] $n -> $outDir/${n}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
