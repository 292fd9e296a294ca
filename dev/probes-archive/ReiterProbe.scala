package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ReiterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.store.LogStore.ensureFromEvents(spark, "/root/testdata/sf0.1")
    val q = graft.logql.Parser.parse("*", System.currentTimeMillis()*1000000L)
    def time(name: String)(f: => Unit): Unit = {
      f
      val runs = (0 until 7).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e6 }
      println(f"[probe] $name%-26s ${runs.sorted.apply(3)}%8.1f ms (min ${runs.min}%6.1f)")
    }
    time("lastN_full") {
      graft.store.LogStore.lastN(spark, dir, q, 100, System.currentTimeMillis()*1000000L)
    }
    val (df, _) = graft.store.LogStore.lastN(spark, dir, q, 100, System.currentTimeMillis()*1000000L)
    val json = df.select(to_json(struct(df.columns.map(c => col("`"+c+"`")).toSeq: _*)))
    time("json_toLocalIterator") {
      val it = json.toLocalIterator(); while (it.hasNext) it.next()
    }
    time("json_collect") { json.collect(); () }
    // HTTP floor: a trivial endpoint on the same server machinery
    val srv = new graft.server.QueryServer(spark,
      () => graft.store.LogStore.read(spark, dir), 0, storeDir = Some(dir))
    val port = srv.start()
    def hit(path: String): Unit = {
      val conn = new java.net.URI(s"http://127.0.0.1:$port$path")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.getResponseCode; conn.getInputStream.readAllBytes(); conn.disconnect()
    }
    time("http_metrics") { hit("/metrics") }
    time("http_lastn") { hit("/select/logsql/query?query=%2A&limit=100") }
    srv.stop(); spark.stop(); System.exit(0)
  }
}
