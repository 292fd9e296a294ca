package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: SF-dependent pinned-oracle values — not part of the engine. */
object PinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val n = graft.Tables.events(spark, d).count()
      val c = graft.SparkEntry.queries("q_lql_sample")(spark, d).collect().head.getLong(0)
      val shards = graft.SparkEntry.queries("q_export_shards")(spark, d).collect()
        .map(r => s"(${r.getLong(0)},${r.getLong(1)})").mkString(",")
      println(s"PIN $sf events=$n sample_c=$c shards=$shards")
    }
    spark.stop()
  }
}
