package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScanAfterIngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/repo/target/graft_scanbench/v1/sf0.1"
    val df = spark.read.parquet(dir)
    def scan(): Double = {
      val t0 = System.nanoTime()
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(bit_xor(col("h"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    scan()
    println("scan before ingest: " + Seq.fill(3)(scan()).map(t => f"$t%.2f").mkString(" "))
    // minimal ingest: one HTTP server, 16 posts
    val idir = s"/root/repo/target/probe_ingest-${System.nanoTime()}"
    val srv = new graft.server.IngestServer(spark, idir)
    val port = srv.start()
    def post(i: Int): Int = {
      val body = (0 until 5000).map { j =>
        s"""{"_time":"2024-01-05T10:00:00Z","_msg":"probe row $i $j","app":"a${i%8}"}"""
      }.mkString("\n").getBytes("UTF-8")
      val c = new java.net.URI(s"http://127.0.0.1:$port/insert/jsonline?_stream_fields=app")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      c.setRequestMethod("POST"); c.setDoOutput(true)
      c.getOutputStream.write(body); val rc = c.getResponseCode
      c.getInputStream.readAllBytes(); c.disconnect(); rc
    }
    (0 until 16).foreach(post)
    srv.stop()
    println("threads now: " + Thread.activeCount())
    System.gc()
    println("scan after ingest:  " + Seq.fill(3)(scan()).map(t => f"$t%.2f").mkString(" "))
    spark.stop()
  }
}
