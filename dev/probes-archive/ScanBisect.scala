package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
object ScanBisect {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
    if (sys.env.get("TZUTC").contains("1"))
      b.config("spark.sql.session.timeZone", "UTC")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/repo/target/graft_scanbench/v1/sf0.1"
    if (sys.env.get("FOOTERS").contains("1")) {
      val hconf = spark.sessionState.newHadoopConf()
      val path = new org.apache.hadoop.fs.Path(dir)
      val fs = path.getFileSystem(hconf)
      val n = fs.listStatus(path).filter(_.getPath.getName.endsWith(".parquet")).map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, hconf))
        try r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
          .map(_.getTotalUncompressedSize).sum finally r.close()
      }.sum
      println("footer bytes " + n)
    }
    val df = spark.read.parquet(dir)
    def scan(): Double = {
      val t0 = System.nanoTime()
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(bit_xor(col("h"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    scan()
    println(s"TZUTC=${sys.env.getOrElse("TZUTC","0")} FOOTERS=${sys.env.getOrElse("FOOTERS","0")} scan: " +
      Seq.fill(3)(scan()).map(t => f"$t%.2f").mkString(" "))
    spark.stop()
  }
}
