package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decimal-sum vs exact long-cents arithmetic on the hot agg path. */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.Tables.lineitem(spark, sfDir)
    def t(name: String)(f: => Any): Unit = {
      f
      val ts = Seq.fill(5) { val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e6 }.sorted
      println(f"$name%-30s ${ts(2)}%8.1fms")
    }
    t("decimal (current)") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)),
          sum(col("l_quantity").cast(DecimalType(30,2))).cast("double"),
          sum(col("l_extendedprice").cast(DecimalType(18,2)) *
              (lit(1) - col("l_discount").cast(DecimalType(18,2)))).cast("double"))
        .collect()
    }
    val qtyE2 = round(col("l_quantity") * 100).cast(LongType)
    val revE4 = round(col("l_extendedprice") * 100).cast(LongType) *
      (lit(100L) - round(col("l_discount") * 100).cast(LongType))
    t("long cents") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)),
          (sum(qtyE2) / 100.0),
          (sum(revE4) / 10000.0))
        .collect()
    }
    t("long cents, dec38 sum") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)),
          (sum(qtyE2.cast(DecimalType(38,0))) / 100).cast("double"),
          (sum(revE4.cast(DecimalType(38,0))) / 10000).cast("double"))
        .collect()
    }
    // value check: compare the three
    val a = li.agg(sum(col("l_extendedprice").cast(DecimalType(18,2)) *
      (lit(1) - col("l_discount").cast(DecimalType(18,2)))).cast("double")).head.getDouble(0)
    val b = li.agg(sum(revE4)).head.getLong(0) / 10000.0
    val c = li.agg((sum(revE4.cast(DecimalType(38,0))) / 10000).cast("double")).head.getDouble(0)
    println(s"revenue decimal=$a longcents=$b dec38=$c equal=${a == b && b == c}")
    spark.stop()
  }
}
