package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: splits a query's wall time into DataFrame construction,
  * Catalyst analyze+optimize, and execution — distinguishes driver-side
  * planning cost (fixed, noise at 100 TB) from real scan/compute time.
  * Not part of the engine. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, d).collect() // warm
      val reps = 3
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, d)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // forces analyze + optimize + plan
        val t2 = System.nanoTime()
        df.collect()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val b = ts.map(_._1).min; val o = ts.map(_._2).min; val e = ts.map(_._3).min
      println(f"$n%-22s build=$b%.3f plan=$o%.3f exec=$e%.3f")
    }
    spark.stop()
  }
}
