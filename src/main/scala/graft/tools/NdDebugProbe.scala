package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: print FieldNameMeta stats + bloomWriteOptions for a test
  * store with a high-cardinality column. */
object NdDebugProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"/root/repo/target/nddebug/${System.nanoTime()}"
    val df = spark.range(0, 60000, 1, 4)
      .select(timestamp_micros(lit(1704067200000000L) + col("id")).as("_time"),
        concat(lit("m"), col("id")).as("_msg"),
        lower(hex(xxhash64(col("id")))).as("trace"),
        lit("app1").as("app"))
    graft.store.LogStore.ingest(df, dir, Seq("app"), filesPerDay = 4)
    val stats = graft.store.FieldNameMeta.load(dir)
    stats.foreach { case (part, m) =>
      println(s"NDDEBUG part=$part " + m.map { case (f, s) =>
        s"$f(hits=${s.hits},nd=${s.nd})" }.mkString(" "))
    }
    val schema = spark.read.parquet(s"$dir/logs").schema
    println("NDDEBUG opts=" +
      graft.store.LogStore.bloomWriteOptions(dir, schema))
    graft.store.Compaction.optimize(spark, dir, minFilesToCompact = 2,
      skipAtTargetSize = false)
    import scala.jdk.CollectionConverters._
    val conf = new org.apache.hadoop.conf.Configuration()
    graft.store.Fs.list(s"$dir/logs").flatMap(t =>
        graft.store.Fs.list(t.getPath.toString))
      .flatMap(d => graft.store.Fs.list(d.getPath.toString))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .foreach { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
        try {
          val offs = r.getFooter.getBlocks.asScala.flatMap(
            _.getColumns.asScala.filter(_.getPath.toDotString == "trace")
              .map(_.getBloomFilterOffset))
          println(s"NDDEBUG file=${f.getPath.getName} traceBloomOffsets=$offs")
        } finally r.close()
      }
  }
}
