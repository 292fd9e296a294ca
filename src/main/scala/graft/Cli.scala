package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interactive LogsQL shell (the reference ships `vlogscli`): point it at a
  * log-store directory (one containing `logs/`) or any parquet path, type
  * LogsQL, get NDJSON rows back.
  *
  * {{{
  *   sbt "runMain graft.Cli /path/to/store"            # REPL
  *   sbt "runMain graft.Cli /path/to/store 'err | stats count()'"  # one-shot
  * }}}
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.Cli <storeDir|parquetPath> [query]")
      sys.exit(2)
    }
    val path = args(0)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val source: DataFrame =
      if (new java.io.File(s"$path/logs").isDirectory)
        graft.store.LogStore.read(spark, path)
      else spark.read.parquet(path)

    def run(q: String, limit: Int = 1000): Unit =
      try {
        val out = graft.logql.Compiler.run(source, q)
        val json = out.limit(limit)
          .select(to_json(struct(out.columns.map(c => col("`" + c + "`")).toSeq: _*)))
        val it = json.toLocalIterator()
        var n = 0
        while (it.hasNext) { println(it.next().getString(0)); n += 1 }
        System.err.println(s"-- $n row(s)")
      } catch {
        case e: Exception => System.err.println(s"error: ${e.getMessage}")
      }

    if (args.length > 1) run(args.drop(1).mkString(" "))
    else {
      System.err.println("graft LogsQL shell — empty line or 'exit' quits")
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
      var line = in.readLine()
      while (line != null && line.trim.nonEmpty && line.trim != "exit") {
        run(line.trim)
        line = in.readLine()
      }
    }
    spark.stop()
  }
}
