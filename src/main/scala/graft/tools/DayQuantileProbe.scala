package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: attribute the day_quantile regression seen in ScaleProbe —
  * which stage of `stats by (_time:1d) quantile(...) | sort by (_time)`
  * eats the time on the 20M-row store. */
object DayQuantileProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/repo/target/graft_scale/v1/rows20000000")
    val logs = graft.store.LogStore.read(spark, dir)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[dayq] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    time("count") { logs.count() }
    time("quantile_only") {
      graft.logql.Compiler.run(logs,
        "* | stats by (_time:1d) quantile(0.99, value) p99").collect()
    }
    time("quantile_sort") {
      graft.logql.Compiler.run(logs,
        "* | stats by (_time:1d) quantile(0.99, value) p99 | sort by (_time)").collect()
    }
    time("median_by_day") {
      graft.logql.Compiler.run(logs,
        "* | stats by (_time:1d) median(value) m").collect()
    }
    time("max_by_day") {
      graft.logql.Compiler.run(logs,
        "* | stats by (_time:1d) max(value) m").collect()
    }
    time("row_max_by_day") {
      graft.logql.Compiler.run(logs,
        "* | stats by (_time:1d) row_max(value) rm").collect()
    }
    time("min_string_field") {
      graft.logql.Compiler.run(logs,
        "* | stats by (_time:1d) min(_msg) m").collect()
    }
    spark.stop()
  }
}
