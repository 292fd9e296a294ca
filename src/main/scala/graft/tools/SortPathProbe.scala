package graft.tools

import org.apache.spark.sql.SparkSession

/** Fresh + warm timing for the unlimited-sort bench entries (the r13
  * regression surface: Compiler.globalSort's interactive single-partition
  * path). Mirrors Bench's methodology: fresh = new Dataset per call,
  * median of 3; warm = re-collect of the SAME Dataset, median of 3.
  *
  * Usage: runMain graft.tools.SortPathProbe [sfDir]
  */
object SortPathProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q_lql_uniq", "q_lql_uniq_values", "q_lql_field_names",
      "q_uniq", "q_lql_sort_rank", "q_lql_values")
      .filter(graft.SparkEntry.queries.contains)
    names.foreach { n => // warmup pass
      try graft.SparkEntry.queries(n)(spark, sfDir).collect()
      catch { case e: Throwable => println(s"WARMUP FAIL $n: $e") }
    }
    names.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      def fresh(): Double = {
        val t0 = System.nanoTime(); q(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val f = Seq.fill(3)(fresh()).sorted.apply(1)
      val df = q(spark, sfDir); df.collect()
      def warm(): Double = {
        val t0 = System.nanoTime(); df.collect()
        (System.nanoTime() - t0) / 1e9
      }
      val w = Seq.fill(3)(warm()).sorted.apply(1)
      println(f"SORTPATH $n%-22s fresh=${f}%.3f warm=${w}%.3f")
    }
    spark.stop()
  }
}
