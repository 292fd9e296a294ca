package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Is the events-scan floor per-task setup (fewer files would win) or
  * per-row decode (more files would win)? */
object ScanFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      f
      val ts = Seq.fill(5) { val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e6 }.sorted
      println(f"$name%-34s ${ts(2)}%8.1fms")
    }
    val raw1 = spark.read.parquet(s"$sfDir/events.parquet") // 1 file
    t("raw 1-file sum(len(props))") { raw1.agg(sum(length(col("props")))).collect() }
    val multi = graft.Tables.load(spark, sfDir, "events") // 16 files
    t("rewritten 16-file sum(len)") { multi.agg(sum(length(col("props")))).collect() }
    for (k <- Seq(2, 4, 8)) {
      val dir = s"/root/repo/target/scanfloor_$k"
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        raw1.repartition(k).write.mode("overwrite").parquet(dir)
      val df = spark.read.parquet(dir)
      t(s"$k-file sum(len)") { df.agg(sum(length(col("props")))).collect() }
    }
    val ev = graft.Tables.eventsLog(spark, sfDir)
    t("eventsLog sum(len(_msg))") { ev.agg(sum(length(col("_msg")))).collect() }
    spark.stop()
  }
}
