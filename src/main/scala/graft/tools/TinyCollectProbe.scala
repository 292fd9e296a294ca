package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: per-collect floor of trivial plans on the interactive session. */
object TinyCollectProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = graft.Sessions.interactive(spark)
    import s.implicits._
    val local = (1 to 12).map(i => (s"f$i", s"v$i", i.toLong))
      .toDF("field_name", "field_value", "hits")
    val plain = local.filter(col("hits") > 0)
    val sorted = local.orderBy("field_name", "field_value")
    def bench(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      (0 until 10).foreach(_ => df.collect())
      val ts = (0 until 40).map { _ =>
        val t0 = System.nanoTime(); df.collect(); (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$name%-12s median=${ts(20)}%7.2f ms  min=${ts.head}%7.2f")
    }
    val spSorted = local.repartition(1).sortWithinPartitions("field_name", "field_value")
    bench("plain", plain)
    bench("spSorted", spSorted)
    val facets = graft.SparkEntry.queries("q_store_facets")(spark, "/root/testdata/sf0.1")
    bench("facets", facets)
    bench("plain2", plain)
    bench("facets2", facets)
    val localSorted = local.coalesce(1).sortWithinPartitions("field_name")
    bench("coalSorted", localSorted)
    spark.stop()
  }
}
