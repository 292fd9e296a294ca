package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: q_sample_mixture pinned-oracle values per SF — not part of the engine. */
object MixProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val rows = graft.SparkEntry.queries("q_sample_mixture")(spark, s"/root/testdata/$sf")
        .collect().map(r => s"('${r.getString(0)}',${r.getLong(1)},${r.getLong(2)})").mkString(",")
      println(s"MIX $sf $rows")
    }
    spark.stop()
  }
}
