package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for needed-fields pruning: at toy benchmark scale the
  * per-query scheduler floor hides the bare-unpack rewrite; here a
  * multi-million-row relation of wide JSON documents makes the parse the
  * dominant cost, and the probe A/Bs the SAME query with the bound
  * enabled vs force-disabled (-Dgraft.neededfields.disable).
  *
  * Usage: runMain graft.tools.UnpackScaleProbe [rows] [keysPerDoc]
  */
object UnpackScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nKeys = args.lift(1).map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic wide JSON docs, materialized once to parquet so both
    // arms scan identical bytes
    val path = s"/root/repo/target/unpack_scale_${n}_$nKeys"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      val keys = (0 until nKeys).map(i => s"k$i")
      val json = concat(
        lit("{"),
        concat_ws(",", keys.zipWithIndex.map { case (k, i) =>
          concat(lit(s""""$k":""""), (col("id") * 31 + i) % 1000,
            lit(s"-payload-$i\""))
        }: _*),
        lit("}"))
      spark.range(n).select(col("id"), json.as("_msg"))
        .repartition(32)
        .write.mode("overwrite").parquet(path)
    }
    val src = spark.read.parquet(path)
    val q = "* | unpack_json from _msg | stats by (k3) count() c"
    def run(label: String): Double = {
      graft.logql.Compiler.run(src, q).count() // warm
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        graft.logql.Compiler.run(src, q).count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(1)
      println(f"[unpackscale] $label%-22s ${med}%7.2f s  (${n / med / 1e6}%5.1f M rows/s)")
      med
    }
    val bounded = run("bounded (needed-fields)")
    System.setProperty("graft.neededfields.disable", "1")
    val full = run("full from_json(Map)")
    System.clearProperty("graft.neededfields.disable")
    println(f"[unpackscale] speedup ${full / bounded}%.2fx at $n rows x $nKeys keys")
    spark.stop()
  }
}
