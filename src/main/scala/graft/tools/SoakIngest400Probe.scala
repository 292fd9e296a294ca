package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8

/** One-off: reproduce the r14 soak's HTTP 400 on /insert/jsonline against
  * a store with the soak's exact bulk schema. Prints the response body. */
object SoakIngest400Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"/root/repo/target/soak400_probe/${System.nanoTime()}"
    val df = spark.range(0, 1000, 1, 4)
      .withColumn("_time", timestamp_micros(lit(1704067200000000L) + col("id")))
      .withColumn("event_type", lit("view"))
      .withColumn("user_id", col("id") % 100)
      .withColumn("value", col("id") / 100.0)
      .withColumn("app", concat(lit("app"), col("id") % 4))
      .withColumn("_msg", concat(lit("m "), col("id")))
      .select("_time", "_msg", "event_type", "user_id", "value", "app")
    graft.store.LogStore.ingest(df, dir, Seq("app"), filesPerDay = 2)
    val srv = new graft.server.IngestServer(spark, dir,
      defaultStreamFields = Seq("app"))
    val port = srv.start()
    val body = (0 until 20).map { j =>
      s"""{"_time":"2024-01-30T21:${f"${j % 60}%02d"}:00Z","_msg":"soak ingest row $j","app":"app${j % 4}","event_type":"soak","user_id":$j,"value":1.5}"""
    }.mkString("\n").getBytes(UTF_8)
    val conn = new java.net.URI(
      s"http://127.0.0.1:$port/insert/jsonline?_stream_fields=app")
      .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST"); conn.setDoOutput(true)
    conn.getOutputStream.write(body)
    val code = conn.getResponseCode
    val resp = try new String(conn.getInputStream.readAllBytes(), UTF_8)
      catch { case _: Exception =>
        new String(conn.getErrorStream.readAllBytes(), UTF_8) }
    println(s"PROBE400 code=$code body=$resp")
    srv.stop()
    spark.stop()
  }
}
