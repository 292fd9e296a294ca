package graft.tools
import org.apache.spark.sql.SparkSession
object FloorProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rdd = spark.sparkContext.parallelize(1 to 1, 1)
    (1 to 20).foreach(_ => rdd.count())
    val ts = (1 to 50).map { _ =>
      val t = System.nanoTime(); rdd.count(); (System.nanoTime()-t)/1e6
    }.sorted
    println(f"rdd1: min=${ts.head}%.2f p25=${ts(12)}%.2f med=${ts(25)}%.2f p75=${ts(37)}%.2f max=${ts.last}%.2f")
    // sql 1-slice
    val df = spark.range(0,1,1,1)
    (1 to 20).foreach(_ => df.count())
    val ts2 = (1 to 50).map { _ =>
      val t = System.nanoTime(); df.count(); (System.nanoTime()-t)/1e6
    }.sorted
    println(f"sql1slice: min=${ts2.head}%.2f p25=${ts2(12)}%.2f med=${ts2(25)}%.2f p75=${ts2(37)}%.2f max=${ts2.last}%.2f")
    val df2 = spark.range(1)
    (1 to 20).foreach(_ => df2.count())
    val ts3 = (1 to 50).map { _ =>
      val t = System.nanoTime(); df2.count(); (System.nanoTime()-t)/1e6
    }.sorted
    println(f"sqlrange1(32sl): min=${ts3.head}%.2f p25=${ts3(12)}%.2f med=${ts3(25)}%.2f p75=${ts3(37)}%.2f max=${ts3.last}%.2f")
    spark.stop()
  }
}
