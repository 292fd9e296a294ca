package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: reproduce the sf0.001 q_stream_context off-by-one. */
object StreamCtxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val dir = graft.store.LogStore.ensureFromEvents(spark, d)
    val logs = graft.store.LogStore.read(spark, dir)
    // the failing query
    val out = graft.logql.Compiler.run(logs,
      "value:>300 | stream_context before 2 after 1 time_window 4w | stats count() nrows, sum(event_id) ids")
    out.show(false)
    // the context rows themselves
    val ctx = graft.logql.Compiler.run(logs,
      "value:>300 | stream_context before 2 after 1 time_window 4w | fields _time, event_id, event_type, value | sort by (event_id)")
    ctx.show(100, false)
    // the raw match set
    val m = graft.logql.Compiler.run(logs,
      "value:>300 | fields _time, event_id, event_type, value | sort by (event_id)")
    m.show(100, false)
    // what does the store hold for the relevant events?
    logs.select(col("_time"), col("event_id"), col("event_type"), col("value"))
      .filter(col("value") > 250)
      .orderBy("event_id").show(100, false)
    spark.stop()
  }
}
