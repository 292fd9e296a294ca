package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate where q_lql_collapse's task time goes: scan, regex, or groupBy. */
object CollapseProbe {
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
      f // warm
      val ts = Seq.fill(3) { val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e6 }.sorted
      println(f"$name%-28s ${ts(1)}%8.1fms")
    }
    val numRe = "\\b\\d+(?:\\.\\d+)?\\b"
    t("bare scan sum(len)") { ev.agg(sum(length(col("_msg")))).collect() }
    t("one regexp_replace") { ev.agg(sum(length(regexp_replace(col("_msg"), numRe, "<N>")))).collect() }
    t("uniq no-regex") { ev.groupBy("_msg").count().agg(count(lit(1))).collect() }
    t("full q_lql_collapse") { graft.SparkEntry.queries("q_lql_collapse")(spark, sfDir).count() }
    t("count only") { ev.count() }
    spark.stop()
  }
}
