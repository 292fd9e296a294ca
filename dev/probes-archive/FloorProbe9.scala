package graft.tools
import org.apache.spark.sql.SparkSession

/** Split first-execution cost: toRdd (codegen source gen + exchange/
  * subquery prep) vs job submit+run vs re-run. Counts jobs and Janino
  * compiles per section. */
object FloorProbe9 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jc = new java.util.concurrent.atomic.AtomicLong(0)
    val tc = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jc.incrementAndGet()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = tc.incrementAndGet()
    })
    def compiles = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    val names = if (args.nonEmpty) args.toSeq else
      Seq("q_dedup_ngram", "q_dedup_substr", "q_lql_ip_bucket", "q_agg_stats")
    names.foreach { n =>
      (1 to 8).foreach(_ => graft.SparkEntry.queries(n)(spark, sfDir).count())
      val rows = (1 to 7).map { _ =>
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val agg = df.groupBy().count()
        val qe = agg.queryExecution
        qe.executedPlan
        val c0 = compiles; val j0 = jc.get; val t0 = tc.get
        val tA = System.nanoTime()
        val rdd = qe.toRdd
        val tB = System.nanoTime()
        rdd.count()
        val tC = System.nanoTime()
        rdd.count()
        val tD = System.nanoTime()
        (tB-tA, tC-tB, tD-tC, compiles-c0, jc.get-j0, tc.get-t0)
      }
      def mn(i: Int) = rows.map(_.productElement(i).asInstanceOf[Long]).min/1e6
      val last = rows.last
      println(f"$n%-18s toRdd=${mn(0)}%7.1f job1=${mn(1)}%7.1f job2=${mn(2)}%7.1f compiles=${last._4} jobs=${last._5} tasks=${last._6}")
    }
    spark.stop()
  }
}
