package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[2,16,4096] runs the whole oracle
    // suite over real executor JVMs (serialization + exchange + broadcast
    // over the wire) — the multi-JVM smoke that flushes driver-lucky
    // assumptions out of plan-keyed caches and the group committer
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      // static conf: hold the whole suite's generated classes (the
      // default 100-entry cache thrashes across 138 queries)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
    // local-cluster executors are separate JVMs launched with Spark's own
    // classpath — hand them the sbt run classpath (same machine) so the
    // graft classes resolve without a packaged jar
    val spark = (if (master.startsWith("local-cluster"))
      builder.config("spark.executor.extraClassPath", sys.props("java.class.path"))
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCallSite("graft") // skip per-RDD stack walks
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // full stack to stderr AND an on-disk marker, so a throwing query
        // is diagnosable from the driver artifacts alone (the CompilerSpec
        // all-queries smoke test catches these first in `sbt test`)
        System.err.println(s"[verify] $name failed:")
        e.printStackTrace()
        val sw = new java.io.StringWriter()
        e.printStackTrace(new java.io.PrintWriter(sw))
        Files.writeString(Paths.get(s"$outDir/$name.error"), sw.toString)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
