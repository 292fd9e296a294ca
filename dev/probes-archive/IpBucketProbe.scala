package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: component timings of the q_lql_ip_bucket shape — where do
  * the milliseconds go (scan, JsonGet, format, ipv4 parse, group)? */
object IpBucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ev = graft.Tables.eventsLog(spark, d)
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val runs = (0 until 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"[probe] $name%-28s ${runs.sorted.apply(2)}%8.1f ms (min ${runs.min}%6.1f)")
    }
    time("scan_count") { ev.count() }
    time("scan_msg_len") { ev.select(sum(length(col("_msg")))).collect(); 0L }
    time("jsonget_k") {
      ev.select(graft.functions.JsonGet.scalarOrJson(col("_msg"), "k").as("k"))
        .groupBy("k").count().collect(); 0L }
    time("from_json_map_k") {
      ev.select(element_at(from_json(col("_msg"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)), "k").as("k"))
        .groupBy("k").count().collect(); 0L }
    time("jsonget_format_ip_group") {
      val k = graft.functions.JsonGet.scalarOrJson(col("_msg"), "k")
      val ip = concat(lit("10.1."), coalesce(k, lit("")), lit(".9"))
      val n = graft.functions.Ipv4Parse.ipv4ToLong(ip)
      val m = (n - pmod(n, lit(256L))).cast("long")
      ev.select(m.as("b")).groupBy("b").count().collect(); 0L }
    val q = """* | unpack_json from _msg | format "10.1.<k>.9" as ip
               | stats by (ip:/24) count() hits | sort by (ip)"""
    time("full_query") { graft.logql.Compiler.run(ev, q).collect(); 0L }
    time("full_query_build_only") { graft.logql.Compiler.run(ev, q); 0L }
    val prebuilt = graft.logql.Compiler.run(ev, q)
    // collect() on ONE Dataset reuses its QueryExecution (AQE replays
    // materialized shuffle stages — measures only the final stage);
    // count() builds a fresh QueryExecution per call — the honest
    // re-execution the bench measures through the plan memo
    time("full_query_exec_only") { prebuilt.collect(); 0L }
    time("prebuilt_fresh_count") { prebuilt.count() }
    time("scan_count_fresh") {
      ev.select(org.apache.spark.sql.functions.length(col("_msg")).as("l"))
        .agg(sum(col("l"))).count()
    }
    spark.stop()
  }
}
