package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Effect of sc.setCallSite + broadcast.compress=false on the fresh-count
  * floor of a minimal 3-stage query and the dedup trio. */
object CallSiteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.broadcast.compress",
        sys.env.getOrElse("SPARK_GRAFT_BCOMP", "true"))
      .getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")
    val spark = graft.Sessions.interactive(spark0)
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 50).select(col("doc_id"), col("text"))
    import graft.functions.Shingles.shingles
    val exploded = docs0.select(col("doc_id").as("id"),
      explode(shingles(col("text"), 3)).as("g"))
    val q = exploded.groupBy("g").agg(count(lit(1)).as("c"))
    def mins(mk: => Long, k: Int): Double =
      (1 to k).map { _ =>
        val t = System.nanoTime(); mk; (System.nanoTime()-t)/1e6 }.min
    (1 to 5).foreach(_ => q.count())
    println(f"minimal3stage default-callsite min=${mins(q.count(), 9)}%.1fms")
    spark0.sparkContext.setCallSite("graft")
    println(f"minimal3stage fixed-callsite   min=${mins(q.count(), 9)}%.1fms")
    Seq("q_dedup_ngram", "q_dedup_substr", "q_dedup_substr_chars").foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark0, sfDir)
      df.count(); df.count()
      println(f"$n%-22s min=${mins(df.count(), 7)}%.1fms (fixed callsite)")
    }
    spark0.stop()
  }
}
