package graft.tools
import org.apache.spark.sql.SparkSession

/** Decompose one fresh count() on the interactive path:
  * build(memo-hit) / analysis / optimization / physical-planning /
  * rdd-job-only / full-collect-with-SQL-events. 10 warm + min-of-9. */
object FloorProbe8 {
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
    val names = if (args.nonEmpty) args.toSeq else
      Seq("q_dedup_ngram", "q_dedup_substr", "q_lql_ip_bucket", "q_agg_stats")
    names.foreach { n =>
      (1 to 10).foreach(_ => graft.SparkEntry.queries(n)(spark, sfDir).count())
      val rows = (1 to 9).map { _ =>
        val tB0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val agg = df.groupBy().count()
        val qe = agg.queryExecution
        val tB1 = System.nanoTime()
        qe.analyzed
        val tA = System.nanoTime()
        qe.optimizedPlan
        val tO = System.nanoTime()
        qe.executedPlan
        val tP = System.nanoTime()
        // raw job: execute the prepared physical plan as an RDD action,
        // bypassing SQLExecution's event/explain machinery
        qe.toRdd.count()
        val tR = System.nanoTime()
        // and once more through the full SQL path (re-executes final plan)
        agg.collect()
        val tC = System.nanoTime()
        (tB1-tB0, tA-tB1, tO-tA, tP-tO, tR-tP, tC-tR)
      }
      def mn(i: Int) = rows.map(r => r.productElement(i).asInstanceOf[Long]).min/1e6
      println(f"$n%-18s build=${mn(0)}%6.1f ana=${mn(1)}%6.1f opt=${mn(2)}%6.1f plan=${mn(3)}%6.1f rddjob=${mn(4)}%7.1f sqlcollect=${mn(5)}%7.1f")
    }
    spark.stop()
  }
}
