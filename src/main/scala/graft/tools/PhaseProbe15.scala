package graft.tools
import org.apache.spark.sql.SparkSession

/** r15 scratch probe: split a query's fresh-execution cost into
  * (analysis+optimization+physical planning) vs execution, by forcing a
  * fresh QueryExecution over the memoized logical plan per run — the
  * same re-planning a fresh count() pays. Not part of the engine. */
object PhaseProbe15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1) match {
      case a if a.nonEmpty => a.toSeq
      case _ => Seq("q_dedup_simhash", "q_dedup_ngram", "q_dedup_substr_chars",
        "q_dedup_minhash", "q_dedup_substr", "q_embed_neardup")
    }
    names.foreach(n => graft.SparkEntry.queries(n)(spark, d).count()) // warm
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, d)
      val sess = df.sparkSession
      val runs = Seq.fill(5) {
        val t0 = System.nanoTime()
        val qe = sess.sessionState.executePlan(df.queryExecution.logical)
        qe.executedPlan // fresh analysis + optimization + physical planning
        val t1 = System.nanoTime()
        df.count() // fresh action: re-plans its own tree + executes
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6)
      }.sortBy(r => r._1 + r._2)
      val m = runs(2)
      println(f"$n%-22s plan=${m._1}%7.1fms count(plan+exec)=${m._2}%7.1fms")
    }
    spark.stop()
  }
}
