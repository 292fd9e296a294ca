package graft.tools

import org.apache.spark.sql.SparkSession

/** Dashboard hot-path latency probe (round-12 verdict ask #6):
  * `/select/logsql/hits` and `/select/logsql/stats_query_range` — every
  * Grafana panel refresh is one of these rewrites (logsql.go:116, :694).
  * Measured over the 20M-row / 30-day store on the store-backed server:
  * COLD = a never-seen query text (plan-cache miss, the ad-hoc shape),
  * WARM = repeat of the same text (plan-cache + rendered-body hit).
  * Prints one JSON line for ENDPOINTLAT_r13.json. */
object EndpointLatProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCallSite("graft")
    val dir = "/root/repo/target/fieldbloom_scale/v1/rows20000000"
    require(new java.io.File(s"$dir/logs/_SUCCESS").exists(),
      "run graft.tools.FieldBloomProbe first (builds the 20M store)")
    val srv = new graft.server.QueryServer(spark,
      () => graft.store.LogStore.read(spark, dir), 0, storeDir = Some(dir))
    val port = srv.start()

    def get(pathAndQuery: String): Double = {
      val t0 = System.nanoTime()
      val conn = new java.net.URI(s"http://127.0.0.1:$port$pathAndQuery")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      val code = conn.getResponseCode
      conn.getInputStream.readAllBytes()
      conn.disconnect()
      require(code == 200, s"HTTP $code for $pathAndQuery")
      (System.nanoTime() - t0) / 1e6
    }
    def med(ts: Seq[Double]): Double = ts.sorted.apply(ts.size / 2)
    def enc(s: String): String =
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

    try {
      // JVM/plan warmup outside the measured window
      (0 until 3).foreach(i =>
        get(s"/select/logsql/hits?query=${enc(s"user_id:$i")}&step=1d"))

      def probe(label: String, mk: Int => String): String = {
        // cold: 7 never-seen query texts (same shape, new literal)
        val cold = med((100 to 106).map(k => get(mk(k))))
        // warm: 7 repeats of one text, skip the first (it is the cold run)
        val q = mk(999)
        get(q)
        val warm = med(Seq.fill(7)(get(q)))
        println(f"[endpoint] $label%-18s cold=${cold}%7.1fms warm=${warm}%7.1fms")
        s""""$label":{"cold_ms":$cold,"warm_ms":$warm}"""
      }

      val out = Seq(
        probe("hits", k =>
          s"/select/logsql/hits?query=${enc(s"user_id:${10000 + k}")}&step=1d"),
        probe("hits_by_field", k =>
          s"/select/logsql/hits?query=${enc(s"user_id:${20000 + k}")}&step=1d&field=level"),
        probe("stats_query_range", k =>
          s"/select/logsql/stats_query_range?query=${enc(s"user_id:${30000 + k} | stats by (level) count() hits")}" +
          "&start=2024-01-01T00:00:00Z&end=2024-01-31T00:00:00Z&step=1d"),
        probe("stats_query_range_all", k =>
          s"/select/logsql/stats_query_range?query=${enc(s"level:error user_id:>$k | stats count() hits")}" +
          "&start=2024-01-01T00:00:00Z&end=2024-01-31T00:00:00Z&step=1d"))
      println(s"""{"rows":20000000,${out.mkString(",")}}""")
    } finally { srv.stop(); spark.stop() }
  }
}
