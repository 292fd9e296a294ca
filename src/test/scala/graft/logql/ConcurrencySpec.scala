package graft.logql

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** `options(concurrency=N)` must BOUND intra-query parallelism
  * (parser.go:307 bounds per-query workers in the reference), not just
  * parse: with concurrency=1 no two tasks of the query may overlap. */
class ConcurrencySpec extends SparkSuite {
  import spark.implicits._

  private lazy val src = {
    // 16-file table so the unbounded scan genuinely fans out
    val dir = s"/root/repo/target/conc_spec/${System.nanoTime()}"
    spark.range(0, 200000, 1, 16)
      .withColumn("event_type",
        concat(lit("t"), pmod(col("id"), lit(5L)).cast("string")))
      .withColumn("_msg", concat(lit("row "), col("id").cast("string")))
      .withColumn("_time", timestamp_micros(lit(1704067200000000L) + col("id")))
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def maxConcurrentTasks(body: => Unit): Int = {
    val cur = new java.util.concurrent.atomic.AtomicInteger(0)
    val max = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskStart(e: org.apache.spark.scheduler.SparkListenerTaskStart): Unit = {
        val c = cur.incrementAndGet()
        max.getAndUpdate(m => math.max(m, c))
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        cur.decrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      val bus = spark.sparkContext.getClass.getMethod("listenerBus")
        .invoke(spark.sparkContext)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .foreach(_.invoke(bus))
      max.get()
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("concurrency=1 serializes the query; unbounded runs parallel") {
    val q = "* | stats by (event_type) count() c | sort by (event_type)"
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // warm both plans so the measured runs carry no one-off jobs
    val unbounded = Compiler.run(src, q)
    val bounded = Compiler.run(src, s"options(concurrency=1) $q")
    val expect = rows(unbounded)
    assert(rows(bounded) == expect, "concurrency changed the result")
    val mcUnbounded = maxConcurrentTasks(unbounded.count())
    val mcBounded = maxConcurrentTasks(bounded.count())
    assert(mcUnbounded > 1,
      s"fixture failed to parallelize unbounded ($mcUnbounded)")
    assert(mcBounded == 1, s"concurrency=1 ran $mcBounded tasks at once")
  }

  test("concurrency=4 caps fan-out at 4") {
    val q = "options(concurrency=4) * | stats by (event_type) count() c"
    val df = Compiler.run(src, q)
    df.count()
    val mc = maxConcurrentTasks(df.count())
    assert(mc <= 4 && mc >= 1, s"concurrency=4 observed $mc")
  }
}
