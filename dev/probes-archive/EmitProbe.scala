package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints raw /select/logsql/query NDJSON bodies for emit-shape work. */
object EmitProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.store.LogStore.ensureFromEvents(spark, "/root/testdata/sf0.001")
    val srv = new graft.server.QueryServer(spark,
      () => graft.store.LogStore.read(spark, dir), 0, storeDir = Some(dir))
    val port = srv.start()
    def get(q: String): String = {
      val conn = new java.net.URI(s"http://127.0.0.1:$port/select/logsql/query?query=" +
        java.net.URLEncoder.encode(q, "UTF-8") + "&limit=2")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      val is = if (conn.getResponseCode >= 400) conn.getErrorStream else conn.getInputStream
      new String(is.readAllBytes(), "UTF-8")
    }
    println("== rows: " + get("*").linesIterator.take(1).mkString)
    println("== stats: " + get("* | stats count() c, avg(value) a"))
    println("== math: " + get("* | math (0/0) default 5 as r, 1/0 as inf | fields r, inf"))
    srv.stop(); spark.stop(); System.exit(0)
  }
}
