package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
object SubstrPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val corpus = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") < 60).select(col("doc_id"), col("text"))
    val q = graft.ops.Dedup.duplicateSpans(corpus, "text", "doc_id", k = 8, minDocs = 2)
    val plan = q.queryExecution.executedPlan
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    exchanges.zipWithIndex.foreach { case (e, i) =>
      println(s"===== exchange $i: ${e.outputPartitioning}")
    }
    val idh = exchanges.filter(_.outputPartitioning.toString.contains("h#"))
    if (idh.size >= 2) {
      println("--- canon equal: " + (idh(0).canonicalized == idh(1).canonicalized))
      println("--- canon A:\n" + idh(0).canonicalized.treeString.take(3000))
      println("--- canon B:\n" + idh(1).canonicalized.treeString.take(3000))
    }
    spark.stop()
  }
}
