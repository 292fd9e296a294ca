package graft.tools

import org.apache.spark.sql.SparkSession

/** Realistic-mix ingest rehearsal: LogsGen's vlogsgenerator-shaped lines
  * (19 fields/line — const/var/dict/u8..u64/i64/float/ip/timestamp/json)
  * pushed over HTTP into a live IngestServer, then queried back through
  * LogsQL over the typed fields. The bench's ingest sample uses the
  * narrow fixture rows; THIS is the wide-document path — per-field map
  * dedup, stream registration under churn, and store encoding all see
  * realistic field entropy.
  *
  * Usage: runMain graft.tools.LogsGenIngestProbe [activeStreams logsPerStream workers]
  */
object LogsGenIngestProbe {
  def main(args: Array[String]): Unit = {
    val active = args.headOption.map(_.toInt).getOrElse(200)
    val lps = args.lift(1).map(_.toLong).getOrElse(250L)
    val workers = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-logsgen-ingest")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"/root/repo/target/graft_logsgen_ingest/${System.nanoTime()}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val srv = new graft.server.IngestServer(spark, dir)
    val port = srv.start()
    try {
      val cfg = LogsGen.Config(activeStreams = active, totalStreams = active * 2,
        logsPerStream = lps, workers = workers)
      // lines() partitions = workers, so the blocking POST tasks leave
      // executor slots free for the server's commit jobs (all slots held
      // → group-commit starves → 400 timeout); keep workers < cores when
      // pushing into the same SparkSession
      val df = LogsGen.lines(spark, cfg)
      val t0 = System.nanoTime()
      val (rows, bytes) = LogsGen.push(df,
        s"http://127.0.0.1:$port/insert/jsonline")
      val sec = (System.nanoTime() - t0) / 1e9
      val storeBytes = {
        def walk(f: java.io.File): Long =
          if (f.isFile) f.length
          else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
        walk(new java.io.File(dir))
      }
      println(f"LOGSGENINGEST rows=$rows bytes=$bytes sec=$sec%.2f " +
        f"rows_per_sec=${rows / sec}%.0f mb_per_sec=${bytes / sec / 1e6}%.1f " +
        f"store_mb=${storeBytes / 1e6}%.1f compression=${bytes.toDouble / storeBytes}%.1fx")

      // query the typed fields back through LogsQL (wide-doc read path)
      val src = graft.store.LogStore.read(spark, dir)
      def q(label: String, logsql: String): Long = {
        val t = System.nanoTime()
        val n = graft.logql.Compiler.run(src, logsql).count()
        println(f"LOGSGENINGEST q $label%-22s ${(System.nanoTime() - t) / 1e6}%7.1f ms  rows=$n")
        n
      }
      val total = q("count_all", "* | stats count() c")
      require(total == 1, s"stats row: $total")
      val exact = src.count()
      require(exact == rows, s"stored $exact of $rows")
      q("dict_filter", """dict_0:in(error, fatal) | stats count() c""")
      q("ip_range", """ip_0:ipv4_range(128.0.0.0/1) | stats count() c""")
      q("u32_range", """u32_0:>2000000000 | stats by (dict_0) count() c""")
      q("stream_filter", s"""{host="host_5"} | stats count() c""")
      q("unpack_json", """* | unpack_json from json_0 result_prefix p_ | stats by (p_foo) count() c""")
      println("LOGSGENINGEST OK")
    } finally { srv.stop(); spark.stop() }
  }
}
