package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev probe: attribute q_dedup_substr(_chars)'s sf0.1 time between fresh
  * plan/AQE-stage fixed cost and row work (the NgramProbe pattern), and
  * confirm the spanRollup h-exchange is physically reused (ReusedExchange)
  * rather than shuffling the rollup twice. */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def corpusOf(lim: Int) = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") < lim)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" shared span alpha bravo charlie delta echo foxtrot golf hotel india juliet")))
        .otherwise(col("text")).as("text"))
    val corpus = corpusOf(60)

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val runs = (0 until 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"[probe] $name%-26s ${runs.sorted.apply(2)}%8.1f ms (min ${runs.min}%6.1f)")
    }

    import graft.ops.Dedup
    def q(c: org.apache.spark.sql.DataFrame) =
      Dedup.duplicateSpans(c, "text", "doc_id", k = 8, minDocs = 2)
        .select(col("id").as("doc_id"), col("n_windows"), col("dup_windows"),
          floor(col("dup_fraction") * 1000000).cast(LongType).as("dupfrac_micro"))
        .orderBy("doc_id")
    def qc(c: org.apache.spark.sql.DataFrame) =
      Dedup.duplicateSpanChars(c, "text", "doc_id", k = 50, minDocs = 2)
        .select(col("id"), col("dup_windows")).orderBy("id")

    time("tok_full_fresh") { q(corpus).collect(); () }
    val pre = q(corpus)
    time("tok_exec_prebuilt") { pre.collect(); () }
    time("tok_build_planned") { q(corpus).queryExecution.executedPlan; () }
    time("chars_full_fresh") { qc(corpus).collect(); () }
    // does the h-exchange physically reuse? check the FINAL adaptive plan
    // (AQE reuses materialized stages at runtime, not in the initial plan)
    pre.collect()
    val plan = pre.queryExecution.executedPlan.toString
    println(s"[probe] reused_any: ${plan.contains("Reused")}")
    println(s"[probe] shuffle_exchanges: " +
      "Exchange hashpartitioning".r.findAllIn(plan).length)
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Reused") || l.contains("ShuffleQueryStage"))
      .map(_.trim.take(110)).mkString("[plan] ", "\n[plan] ", ""))
    // scale sweep: fixed cost vs row work
    for (lim <- Seq(60, 600, 6000)) {
      val c2 = corpusOf(lim)
      time(s"tok_fresh_docs_$lim") { q(c2).collect(); () }
    }
    spark.stop()
  }
}
