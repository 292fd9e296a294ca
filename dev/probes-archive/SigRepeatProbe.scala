package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: convergence of repeated signature/LSH passes in one
  * JVM (is the first-pass lump JIT/heap warmup or a real cost?). */
object SigRepeatProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"/root/repo/target/graft_opsscale/v1/docs$nDocs")
    import graft.ops.Dedup
    for (r <- 1 to 4) {
      val t0 = System.nanoTime()
      docs.select(Dedup.minhashSignature(col("text"), 3, 128).as("sig"))
        .agg(sum(size(col("sig")))).collect()
      println(f"SIG pass $r: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = Dedup.minhashLSH(docs, "text", "doc_id", threshold = 0.7).count()
      println(f"LSH pass $r: ${(System.nanoTime() - t0) / 1e9}%.2fs ($c pairs)")
    }
    spark.stop()
  }
}

/** Scratch: star rounds alone on a materialized edge list. */
object CcRoundsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    // n 2-node components plus one 1000-node chain (forces several rounds)
    val edges = ((0 until n).map(i => (i.toLong * 2, i.toLong * 2 + 1)) ++
      (0 until 1000).map(i => (1000000L + i, 1000000L + i + 1))).toDF("id_a", "id_b")
    edges.write.mode("overwrite").parquet("/tmp/cc_edges")
    val e = spark.read.parquet("/tmp/cc_edges")
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      // maxIter varies per pass so each run misses the plan-keyed ccCache
      // and actually re-runs the star rounds (the point of the probe)
      val c = graft.ops.Dedup.connectedComponents(e, maxIter = 25 - r,
        maxLocalEdges = 0L).count()
      println(f"CC pass $r: ${(System.nanoTime() - t0) / 1e9}%.2fs ($c nodes)")
    }
    spark.stop()
  }
}
