package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch diagnostics for the TextStatsKernel parity — not part of the engine. */
object LangProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.TextAnalysis
    val words = Seq("the", "a", "of", "el", "la", "de", "der", "die",
      "und", "que", "nicht", "los", "hello", "wörld", "Ⅻ", "①", "x_1",
      "日本語", "漢", "", "is", "to", "in", "das", "ist", "y", "en")
    val seps = Seq(" ", ", ", ".", "—", "\n", "\t", "!", "", "€")
    val inputs = (for (w1 <- words; s <- seps; w2 <- words)
      yield w1 + s + w2).distinct
    val schema = StructType(Seq(StructField("s", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(inputs.map(Row(_)), 4), schema)
    val out = df.select(col("s"),
        TextAnalysis.langTokenStats(col("s")).as("k"),
        struct(TextAnalysis.langIdTokens(TextAnalysis.tokens(col("s")), col("s")),
          TextAnalysis.tokenCount(col("s"))).as("w"))
      .collect()
    var bad = 0
    out.foreach { r =>
      val k = (r.getStruct(1).getString(0), r.getStruct(1).getLong(1))
      val w = (r.getStruct(2).getString(0), r.getStruct(2).getLong(1))
      if (k != w && bad < 10) {
        bad += 1
        println(s"MISMATCH ${r.getString(0).map(c => if (c < 32) f"\\u${c.toInt}%04x" else c).mkString} kernel=$k spec=$w")
      }
    }
    println(s"done, $bad mismatches of ${out.length}")
    spark.stop()
  }
}
