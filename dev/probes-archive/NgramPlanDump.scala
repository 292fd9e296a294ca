package graft.tools
import org.apache.spark.sql.SparkSession
object NgramPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = if (args.nonEmpty) args(0) else "q_dedup_ngram"
    val df = graft.SparkEntry.queries(n)(spark, sfDir)
    println(df.queryExecution.executedPlan.treeString(false).linesIterator
      .map(_.take(160)).mkString("\n"))
  }
}
