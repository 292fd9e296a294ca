package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch component-level breakdown for the two worst matched-work
  * offenders (q_stream_context, q_dedup_ngram) — not part of the engine. */
object BreakProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-40s ${ts(1)}%.3fs  (${ts.map(t => f"$t%.3f").mkString(",")})")
    }

    // ---- stream_context components ----
    val dir = graft.store.LogStore.ensureFromEvents(spark, d)
    val logs = graft.store.LogStore.read(spark, dir)
    time("store read: count()")(logs.count())
    locally {
      val fdir = new java.io.File(dir + "/logs")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      val fs = walk(fdir).filter(_.getName.endsWith(".parquet"))
      println(s"store files: ${fs.size}  bytes: ${fs.map(_.length()).sum}")
    }
    time("store read: fresh relation count") {
      graft.store.LogStore.read(spark, dir).count()
    }
    time("store read: msg+value decoded") {
      logs.select(sum(octet_length(col("_msg"))), sum(col("value"))).collect(); 1L
    }
    time("filter value:>300 count") {
      graft.logql.Compiler.run(logs, "value:>300 | stats count() c").collect(); 1L
    }
    time("ctx full query") {
      graft.logql.Compiler.run(logs,
        "value:>300 | stream_context before 2 after 1 time_window 4w | stats count() nrows, sum(event_id) ids").collect(); 1L
    }
    time("ctx no stats tail") {
      graft.logql.Compiler.run(logs,
        "value:>300 | stream_context before 2 after 1 time_window 4w | stats count() nrows").collect(); 1L
    }

    // ---- file-packing experiments ----
    val lp = s"/root/repo/target/graft_tbl/v1/${new java.io.File(d).getName}/lineitem"
    time("lineitem 32-file count") { spark.read.parquet(lp).count() }
    time("lineitem 32-file filter+sum") {
      spark.read.parquet(lp)
        .filter(col("l_quantity").between(10, 20) && col("l_discount") > 0.05)
        .agg(count(lit(1)), sum(col("l_extendedprice"))).collect(); 1L
    }
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    time("openCost=0: lineitem filter+sum") {
      spark.read.parquet(lp)
        .filter(col("l_quantity").between(10, 20) && col("l_discount") > 0.05)
        .agg(count(lit(1)), sum(col("l_extendedprice"))).collect(); 1L
    }
    time("openCost=0: store count") {
      graft.store.LogStore.read(spark, dir).count()
    }
    time("openCost=0: ctx full") {
      graft.logql.Compiler.run(graft.store.LogStore.read(spark, dir),
        "value:>300 | stream_context before 2 after 1 time_window 4w | stats count() nrows, sum(event_id) ids").collect(); 1L
    }
    for (oc <- Seq(65536, 262144, 1048576)) {
      spark.conf.set("spark.sql.files.openCostInBytes", oc.toString)
      time(s"openCost=$oc: store count") {
        graft.store.LogStore.read(spark, dir).count()
      }
      time(s"openCost=$oc: ctx full") {
        graft.logql.Compiler.run(graft.store.LogStore.read(spark, dir),
          "value:>300 | stream_context before 2 after 1 time_window 4w | stats count() nrows, sum(event_id) ids").collect(); 1L
      }
    }
    spark.conf.set("spark.sql.files.openCostInBytes", String.valueOf(4*1024*1024))

    // ---- split-count sweep for the lineitem scan ----
    for (k <- Seq(4, 8, 16, 32)) {
      val p = s"/tmp/li_split_$k"
      if (!new java.io.File(s"$p/_SUCCESS").exists())
        spark.read.parquet(lp).repartition(k).write.mode("overwrite").parquet(p)
      time(s"lineitem $k-file filter+sum") {
        spark.read.parquet(p)
          .filter(col("l_quantity").between(10, 20) && col("l_discount") > 0.05)
          .agg(count(lit(1)), sum(col("l_extendedprice"))).collect(); 1L
      }
    }

    // ---- ngram components ----
    import graft.ops.Dedup
    val docs = graft.Tables.documents(spark, d).filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text"))
    val corpus = docs.union(docs.select(
      (col("doc_id") + 10000).as("doc_id"),
      concat(col("text"), lit(" zz zz")).as("text")))
    time("ngram: corpus count")(corpus.count())
    time("ngram: full") {
      Dedup.ngramJaccard(corpus, "text", "doc_id", n = 3, threshold = 0.3).count()
    }
    spark.stop()
  }
}
