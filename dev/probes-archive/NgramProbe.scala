package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: component timings of the q_dedup_ngram shape — attribute the
  * sf0.1 adjusted-ratio regression (r8: 647ms raw vs DuckDB 21ms) between
  * fresh-plan analysis, built-plan re-execution, and actual row work, per
  * stage of the ngramJaccard pipeline (shingle explode → doc-freq cutoff →
  * join → per-doc counts / bucket pair-gen → jaccard join). */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs0 = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") < 50).select(col("doc_id"), col("text"))
    val corpus = docs0.union(docs0.select(
      (col("doc_id") + 10000).as("doc_id"),
      concat(col("text"), lit(" zz zz")).as("text")))

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val runs = (0 until 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"[probe] $name%-30s ${runs.sorted.apply(2)}%8.1f ms (min ${runs.min}%6.1f)")
    }

    import graft.ops.Dedup
    // AQE attribution: per-stage logical re-optimization on a fresh plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("full_fresh_noaqe") {
      Dedup.ngramJaccard(corpus, "text", "doc_id", n = 3, threshold = 0.3)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b").collect()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // full query: fresh plan-build + exec each call (what the bench sees)
    time("full_fresh") {
      Dedup.ngramJaccard(corpus, "text", "doc_id", n = 3, threshold = 0.3)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b").collect()
    }
    // plan build only (no action): parser+analyzer+the DF construction
    time("build_only") {
      Dedup.ngramJaccard(corpus, "text", "doc_id", n = 3, threshold = 0.3)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
      ()
    }
    // exec of a prebuilt DF (optimizer+codegen+run, re-run each call)
    val prebuilt = Dedup.ngramJaccard(corpus, "text", "doc_id", n = 3, threshold = 0.3)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy("id_a", "id_b")
    time("exec_prebuilt") { prebuilt.collect(); () }
    // which planning phase eats the fresh-call residue?
    time("optimize_only") {
      val df = Dedup.ngramJaccard(corpus, "text", "doc_id", n = 3, threshold = 0.3)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
      df.queryExecution.optimizedPlan; ()
    }
    time("physical_only") {
      val df = Dedup.ngramJaccard(corpus, "text", "doc_id", n = 3, threshold = 0.3)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
      df.queryExecution.executedPlan; ()
    }

    // component stages of the single-shuffle shape (each exec'd fresh,
    // so each number includes its own ~100ms planning)
    val exploded = corpus
      .select(col("doc_id").as("id"), explode(graft.ops.Dedup.shingles(col("text"), 3)).as("g"))
    time("explode_count") { exploded.count(); () }
    val gAgg = exploded.groupBy("g")
      .agg(graft.functions.CappedIds.idsWithCount(col("id"), 10001).as("r"))
      .select(col("r._1").as("ids"), col("r._2").as("__df"))
      .filter(col("__df") <= 10000)
    time("gagg") { gAgg.count(); () }
    time("perdoc") {
      gAgg.select(explode(col("ids")).as("id"))
        .groupBy("id").agg(count(lit(1)).as("c")).collect(); () }
    val buckets = gAgg.filter(col("__df") >= 2)
      .select(array_sort(col("ids")).as("ids"))
    val pairs = buckets
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    time("pairs") { pairs.count(); () }
    // raw scan floor: just the 100-doc filter + text length
    time("scan_floor") {
      corpus.select(sum(length(col("text")))).collect(); ()
    }
    // scale sweep: if full_fresh barely grows with 10x/100x the docs, the
    // sf0.1 number is fixed plan/stage cost, not row work
    for (lim <- Seq(50, 500, 5000)) {
      val base = spark.read.parquet(s"$d/documents.parquet")
        .filter(col("doc_id") < lim).select(col("doc_id"), col("text"))
      val c2 = base.union(base.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz zz")).as("text")))
      time(s"fresh_docs_$lim") {
        Dedup.ngramJaccard(c2, "text", "doc_id", n = 3, threshold = 0.3)
          .select(col("id_a"), col("id_b"), col("jaccard"))
          .orderBy("id_a", "id_b").collect()
      }
    }
    spark.stop()
  }
}
