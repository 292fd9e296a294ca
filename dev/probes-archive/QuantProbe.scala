package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics: is the quantization scale inlined per-element? */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val q = graft.ops.Similarity.quantizeInt8(emb, "embedding")
    val plan = q.queryExecution.optimizedPlan.toString
    println("array_max occurrences in optimized plan: " +
      "array_max".r.findAllIn(plan).length)
    println(plan.linesIterator.take(6).mkString("\n").take(2000))
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("warm")(q.agg(sum(element_at(col("q8"), 1))).collect())
    time("quantize pass")(q.agg(sum(element_at(col("q8"), 1))).collect())
    time("scan only")(emb.agg(sum(element_at(col("embedding"), 1))).collect())
    time("scale only")(graft.ops.Similarity.quantizeInt8(emb, "embedding")
      .agg(sum(col("q8_scale"))).collect())
    println("emb rows = " + emb.count())
    val topk = graft.SparkEntry.queries("q_sim_quantized")(spark, d)
    time("q_sim_quantized warm")(topk.count())
    time("q_sim_quantized")(topk.count())
    spark.stop()
  }
}
