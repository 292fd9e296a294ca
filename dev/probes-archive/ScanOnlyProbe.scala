package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScanOnlyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/repo/target/graft_scanbench/v1/sf0.1"
    val df = spark.read.parquet(dir)
    def run(): Unit =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(bit_xor(col("h"))).collect()
    run()
    val ts = Seq.fill(5) {
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }
    println("scan secs: " + ts.map(t => f"$t%.2f").mkString(" "))
    spark.stop()
  }
}
