package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc HTTP query latency (plan-cache MISSES: every request is a
  * distinct query text) with the interactive route on vs off. */
object ServerAdhocProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = graft.store.LogStore.ensureFromEvents(spark, sfDir)
    val srv = new graft.server.QueryServer(spark,
      () => graft.store.LogStore.read(spark, dir), 0, storeDir = Some(dir))
    val port = srv.start()
    def one(q: String): Double = {
      val t0 = System.nanoTime()
      val c = new java.net.URI(s"http://127.0.0.1:$port/select/logsql/query?query=" +
        java.net.URLEncoder.encode(q, "UTF-8")).toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      require(c.getResponseCode == 200)
      c.getInputStream.readAllBytes(); c.disconnect()
      (System.nanoTime() - t0) / 1e6
    }
    def sweep(label: String): Unit = {
      // distinct texts -> plan-cache misses; same SHAPE so codegen warm
      (900 until 905).foreach(i => one(s"user_id:>$i | stats by (event_type) count() c$i"))
      val ts = (0 until 15).map(i =>
        one(s"user_id:>${100 + i} | stats by (event_type) count() x$i")).sorted
      println(f"[adhoc] $label simple median=${ts(7)}%.1fms min=${ts.head}%.1fms")
      (900 until 903).foreach(i => one(
        s"user_id:>$i | stats by (_stream_id) count() c$i, count_uniq(user_id) u$i | sort by (c$i desc) | limit 3"))
      val th = (0 until 15).map(i => one(
        s"user_id:>${200 + i} | stats by (_stream_id) count() y$i, count_uniq(user_id) z$i | sort by (y$i desc) | limit 3")).sorted
      println(f"[adhoc] $label multiex median=${th(7)}%.1fms min=${th.head}%.1fms")
    }
    try {
      spark.conf.set("spark.graft.interactive.maxInputBytes", "0")
      sweep("route_off")
      spark.conf.unset("spark.graft.interactive.maxInputBytes")
      sweep("route_on ")
      spark.conf.set("spark.graft.interactive.maxInputBytes", "0")
      sweep("route_off")
      spark.conf.unset("spark.graft.interactive.maxInputBytes")
      sweep("route_on ")
    } finally srv.stop()
    spark.stop()
  }
}
