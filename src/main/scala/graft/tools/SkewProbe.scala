package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Skewed-stream robustness probe (round-12 verdict ask #3): one
  * `_stream_id` holds 50% of all rows; run `stats by (_stream_id)`,
  * `top by (_stream_id)` and `stream_context` on the PARALLEL path and
  * report per-query max/median task-run-time ratios for the heavy
  * stages — partial aggregation (map-side combine) must absorb the hot
  * key so no stage serializes onto one task. Prints one JSON line for
  * SKEWPROBE_r12.json.
  *
  * Usage: runMain graft.tools.SkewProbe [rows] (default 4000000)
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.adaptive.enabled", "true")
      // this is a parallel-path scale probe: never route to the
      // interactive session regardless of store size
      .config("spark.graft.interactive.maxInputBytes", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCallSite("graft")
    import graft.store.LogStore
    import graft.logql.Compiler

    // --- fixture: 50% of rows in stream app=hot, the rest over 99 apps
    val dir = s"/root/repo/target/graft_skew/v1/rows$rows"
    val t0 = System.nanoTime()
    if (!new java.io.File(s"$dir/logs/_SUCCESS").exists()) {
      val spanUs = 3L * 86400 * 1000000
      val startUs = 1704067200000000L
      val df = spark.range(0, rows, 1, 64)
        .withColumn("_time",
          timestamp_micros(lit(startUs) + col("id") * lit(math.max(spanUs / rows, 1L))))
        .withColumn("app",
          when(pmod(col("id"), lit(2L)) === 0L, lit("hot"))
            .otherwise(concat(lit("app"), pmod(xxhash64(col("id")), lit(99L)))))
        .withColumn("user_id", pmod(xxhash64(col("id"), lit(2)), lit(100000L)))
        .withColumn("level",
          when(pmod(xxhash64(col("id"), lit(3)), lit(50L)) === 0L, lit("error"))
            .otherwise(lit("info")))
        .withColumn("_msg", format_string("user %d %s event from %s",
          col("user_id"), col("level"), col("app")))
        .select("_time", "_msg", "app", "user_id", "level")
      LogStore.ingest(df, dir, Seq("app"), filesPerDay = 8)
      graft.store.Compaction.optimize(spark, dir, minFilesToCompact = 2,
        skipAtTargetSize = true)
      println(f"[skew] build ${(System.nanoTime() - t0) / 1e9}%.0fs")
    }

    // --- per-stage task-time capture
    val tasks = mutable.ArrayBuffer[(Int, Long)]() // (stageId, runMs)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.synchronized { tasks += ((e.stageId, e.taskMetrics.executorRunTime)) }
    })
    def drain(): Unit = {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .foreach(_.invoke(bus))
    }

    val queries = Seq(
      "stats_by_stream" ->
        "* | stats by (_stream_id) count() hits, count_uniq(user_id) users",
      "top_by_stream" -> "* | top 5 by (_stream_id)",
      // context around the rare error rows of every stream — the hot
      // stream contributes 50% of the window input
      "stream_context" ->
        "level:error | stream_context before 2 after 2 time_window 1h | stats count() rows")
    val results = queries.map { case (name, q) =>
      def run(): Long =
        Compiler.run(LogStore.read(spark, dir), q).count()
      run() // warm (plan + codegen + AQE shape)
      drain(); tasks.synchronized(tasks.clear())
      val t = System.nanoTime()
      val n = run()
      val wall = (System.nanoTime() - t) / 1e9
      drain()
      // heavy stages only: a stage's floor tasks (ms-scale) would make
      // ratios meaningless; judge the stages that do the work
      val byStage = tasks.synchronized(tasks.groupBy(_._1)).map {
        case (s, ts) => (s, ts.map(_._2).toSeq.sorted)
      }.filter(_._2.sum >= 200L)
      val worst = byStage.map { case (s, ts) =>
        val med = math.max(ts(ts.size / 2), 1L)
        (s, ts.size, ts.last, med, ts.last.toDouble / med)
      }.toSeq.sortBy(-_._5)
      worst.take(3).foreach { case (s, n2, mx, med, r) =>
        println(f"[skew] $name stage $s tasks=$n2 max=${mx}ms med=${med}ms ratio=$r%.2f") }
      val maxRatio = worst.headOption.map(_._5).getOrElse(1.0)
      (name, wall, n, maxRatio)
    }
    val json = results.map { case (n, w, rows2, r) =>
      s""""$n":{"wall_s":$w,"rows":$rows2,"max_med_task_ratio":$r}"""
    }.mkString(",")
    println(s"""{"rows":$rows,"gate_max_ratio":3.0,$json}""")
    spark.stop()
  }
}
