package graft.tools
import org.apache.spark.sql.SparkSession
object ScExplainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_stream_context")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    println(plan.linesIterator.filter(l =>
      l.contains("ReadSchema") || l.contains("Exchange") || l.contains("Window") ||
      l.contains("Sort") || l.contains("FileScan") || l.contains("Codegen")).mkString("\n").take(4000))
    spark.stop()
  }
}
