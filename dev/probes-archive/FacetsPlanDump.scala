package graft.tools
import org.apache.spark.sql.SparkSession
object FacetsPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val df = graft.SparkEntry.queries("q_store_facets")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    println("FILESCANS=" + "FileScan".r.findAllIn(p).length)
    println("REUSED=" + "ReusedExchange".r.findAllIn(p).length)
    java.nio.file.Files.writeString(java.nio.file.Path.of("/tmp/facets_plan.txt"), p)
    spark.stop()
  }
}
