package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}
import graft.Tables

/** Scratch diagnostics: LSH recall + simhash planted recall at sf0.01. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(q, emb,
      "vec_id", "embedding", "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id")
    for (bits <- Seq(3, 4, 5, 6); probes <- Seq(4, 8)) {
      val approx = Similarity.lshTopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", 10, bits, 64, probes)
        .select("query_id", "neighbor_id")
      val hits = exact.join(approx, Seq("query_id", "neighbor_id")).count()
      println(s"LSH bits=$bits probes=$probes recall=${hits}/50")
    }
    val docs = Tables.documents(spark, d).filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"))
    for (tail <- Seq(" z", " extra tail words"); bands <- Seq(4, 8, 16)) {
      val corpus = docs.union(docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(tail)).as("text")))
      val found = Dedup.simhashCandidates(corpus, "text", "doc_id", bands)
        .filter(col("id_b") === col("id_a") + 10000).count()
      println(s"simhash tail='$tail' bands=$bands found=$found/200")
    }
    spark.stop()
  }
}
