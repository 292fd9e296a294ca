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
    val shards = graft.SparkEntry.queries("q_export_shards")(spark, d)
    println("== q_export_shards ==")
    shards.printSchema()
    shards.show(20, truncate = false)
    val chunks = graft.SparkEntry.queries("q_text_chunks")(spark, d)
    println("== q_text_chunks ==")
    println("rows=" + chunks.count())
    chunks.show(5, truncate = false)
    val pack = graft.SparkEntry.queries("q_text_pack")(spark, d)
    println("== q_text_pack ==")
    pack.show(20, truncate = false)
    spark.stop()
  }
}
