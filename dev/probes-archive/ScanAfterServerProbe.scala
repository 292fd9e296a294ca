package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScanAfterServerProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCallSite("graft")
    val dir = "/root/repo/target/graft_scanbench/v1/sf0.1"
    val df = spark.read.parquet(dir)
    def scan(): Double = {
      val t0 = System.nanoTime()
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(bit_xor(col("h"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    scan()
    println("scan fresh-jvm: " + Seq.fill(3)(scan()).map(t => f"$t%.2f").mkString(" "))
    // replicate serverBench
    val sdir = graft.store.LogStore.ensureFromEvents(spark, sfDir)
    val srv = new graft.server.QueryServer(spark,
      () => graft.store.LogStore.read(spark, sdir), 0, storeDir = Some(sdir))
    val port = srv.start()
    (1 to 16).foreach { _ =>
      val c = new java.net.URI(
        s"http://127.0.0.1:$port/select/logsql/query?query=%2A&limit=100")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      c.getResponseCode; c.getInputStream.readAllBytes(); c.disconnect()
    }
    srv.stop()
    println("scan after server: " + Seq.fill(3)(scan()).map(t => f"$t%.2f").mkString(" "))
    spark.stop()
  }
}
