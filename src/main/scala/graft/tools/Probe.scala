package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics main — not part of the engine. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val hash = graft.logql.Compiler.run(graft.Tables.eventsLog(spark, d),
      "* | hash(event_type) as h | uniq by (event_type, h) | sort by (event_type)")
    println("== q_lql_hash ==")
    hash.printSchema()
    hash.show(20, truncate = false)
    val samp = graft.logql.Compiler.run(graft.Tables.eventsLog(spark, d),
      "* | sample 7 | stats count() c")
    println("== q_lql_sample ==")
    samp.printSchema()
    samp.show(5, truncate = false)
    val audio = graft.SparkEntry.queries("q_multimodal_audio")(spark, d)
    println("== q_multimodal_audio ==")
    audio.printSchema()
    audio.show(10, truncate = false)
    spark.stop()
  }
}
