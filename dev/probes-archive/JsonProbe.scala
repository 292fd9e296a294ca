package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: kernel JSON scalar extraction vs get_json_object over the
  * same generated rows (sum of the extracted value forces full evaluation). */
object JsonProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // realistic log line: a dozen fields, target mid-document
    val df = spark.range(4000000).select(
      concat(lit("{\"ts\":\"2024-01-01T00:00:00Z\",\"level\":\"info\"," +
        "\"svc\":\"api-gw\",\"host\":\"node-17\",\"path\":\"/v1/items\"," +
        "\"method\":\"GET\",\"status\":200,\"k\": "), col("id"),
        lit(", \"dur_ms\":12.5,\"user\":\"u-4711\",\"trace\":\"abc123\"," +
        "\"msg\":\"request completed ok\"}")).as("j"))
      .localCheckpoint()
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count() // warm
      val t0 = System.nanoTime()
      (0 until 3).foreach(_ => mk.count())
      println(s"$tag: ${(System.nanoTime() - t0) / 3e9}s")
    }
    time("jackson")(df.select(sum(get_json_object(col("j"), "$.k").cast("double"))))
    time("kernel ")(df.select(sum(graft.functions.JsonGet.scalarOrJson(col("j"), "k").cast("double"))))
    time("raw    ")(df.select(sum(graft.functions.JsonGet.scalar(col("j"), "k").cast("double"))))
    time("jackson")(df.select(sum(get_json_object(col("j"), "$.k").cast("double"))))
    time("kernel ")(df.select(sum(graft.functions.JsonGet.scalarOrJson(col("j"), "k").cast("double"))))
    time("raw    ")(df.select(sum(graft.functions.JsonGet.scalar(col("j"), "k").cast("double"))))
    spark.stop()
  }
}
