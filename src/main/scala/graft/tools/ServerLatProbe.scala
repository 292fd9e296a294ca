package graft.tools
import org.apache.spark.sql.SparkSession
object ServerLatProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dir = graft.store.LogStore.ensureFromEvents(spark, sfDir)
    val srv = new graft.server.QueryServer(spark,
      () => graft.store.LogStore.read(spark, dir), 0, storeDir = Some(dir))
    val port = srv.start()
    def one(): (Double, String) = {
      val t0 = System.nanoTime()
      val conn = new java.net.URI(
        s"http://127.0.0.1:$port/select/logsql/query?query=%2A&limit=100")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = new String(is.readAllBytes())
      val ms = (System.nanoTime() - t0) / 1e6
      val c = conn.getHeaderField("X-Graft-Plan-Cache")
      conn.disconnect()
      if (code >= 400) { println(s"[probe] HTTP $code: ${body.take(400)}") }
      (ms, c)
    }
    one()
    (1 to 20).foreach { i => val (ms, c) = one(); println(f"[probe] lastN run $i: $ms%7.1f ms cache=$c") }
    srv.stop(); spark.stop(); System.exit(0)
  }
}
