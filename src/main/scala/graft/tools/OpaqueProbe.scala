package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: does a Nondeterministic-wrapped filter stay above its
  * defining projection? */
object OpaqueProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val df = spark.range(10).toDF("id")
      .withColumn("m", map(lit("k"), col("id").cast("string")))
      .filter(call_function("graft_opaque",
        size(map_filter(col("m"), (_, v) => v =!= "")) > 0))
    df.explain("extended")
    spark.stop()
  }
}
