package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** What does the in-memory columnar cache buy on the events scan floor? */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables.eventsLog(spark, sfDir)
    def t(name: String)(f: => Unit): Unit = {
      f
      val ts = Seq.fill(3) { val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e6 }.sorted
      println(f"$name%-28s ${ts(1)}%8.1fms")
    }
    t("uncached sum(len)") { ev.agg(sum(length(col("_msg")))).collect() }
    val evc = ev.cache()
    evc.count() // materialize
    t("cached sum(len)") { evc.agg(sum(length(col("_msg")))).collect() }
    t("cached uniq") { evc.groupBy("_msg").count().agg(count(lit(1))).collect() }
    val numRe = "\\b\\d+(?:\\.\\d+)?\\b"
    t("cached collapse+uniq") {
      evc.withColumn("m", regexp_replace(col("_msg"), numRe, "<N>"))
        .groupBy("m").count().agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
