package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics for multi-tenant store reads — not part of the engine. */
object TenantProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = s"/root/repo/target/server_test/probe-${System.nanoTime()}"
    def mk(tenant: String, n: Int): Unit = {
      val df = (1 to n).map(i =>
        (java.sql.Timestamp.valueOf(s"2024-01-0$i 10:00:00"), s"row $i", "web"))
        .toDF("_time", "_msg", "app")
      graft.store.LogStore.ingest(df, dir, Seq("app"), tenant = tenant)
    }
    mk("0:0", 3); mk("7:0", 2); mk("9:1", 4)
    val logs = graft.store.LogStore.read(spark, dir)
    logs.groupBy("tenant").count().show(false)
    logs.printSchema()
    spark.stop()
  }
}
