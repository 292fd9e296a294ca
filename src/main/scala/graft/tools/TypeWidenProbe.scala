package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-off: can an explicit StringType read schema cover a parquet file
  * whose physical column is INT64 / DOUBLE (schema-widening feasibility
  * for mixed-type store columns)? */
object TypeWidenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/type_widen_probe"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.range(3).select(col("id"), col("id").cast("long").as("v"))
      .write.parquet(s"$dir/logs")
    spark.range(3, 6).select(col("id"),
      concat(lit("s"), col("id")).as("v")).write.mode("append").parquet(s"$dir/logs")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    def attempt(label: String, vectorized: Boolean): Unit = {
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", vectorized)
      try {
        val rows = spark.read.schema(schema).parquet(s"$dir/logs")
          .orderBy("id").collect()
        println(s"WIDEN $label OK: " + rows.map(r => r.get(1)).mkString(","))
      } catch { case e: Exception =>
        println(s"WIDEN $label FAIL: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).replace('\n', ' ').take(200))
      }
    }
    attempt("vectorized", vectorized = true)
    attempt("parquet-mr", vectorized = false)
    spark.stop()
  }
}
