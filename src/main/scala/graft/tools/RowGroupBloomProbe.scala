package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._

/** Sub-file pruning granularity probe (r13 verdict "What's missing #2"):
  * the reference blooms per 8M-row BLOCK inside a part
  * (block_header.go:584-615); the repo's token sidecars stop at file
  * granularity, so a hot needle in one row group of a 256 MB compacted
  * file still decodes the whole file.
  *
  * The Spark-native path to row-group granularity is parquet's OWN
  * machinery, driven from the scan by predicate pushdown:
  *   - parquet column indexes (min/max per page, on by default) — skip
  *     row groups/pages for range/equality predicates on sorted-ish
  *     columns;
  *   - parquet bloom filters (parquet.bloom.filter.enabled#col=true at
  *     write time) — skip row groups for EQUALITY predicates on
  *     high-cardinality unsorted columns, where min/max is useless.
  *
  * This probe writes one multi-row-group file of high-cardinality hex
  * ids twice (with and without a column bloom), plants one needle, and
  * measures bytes read + wall for `id_hex = needle` through the normal
  * Spark scan. Row-group skipping shows up as a bytes-read collapse.
  *
  * Prints ROWGROUP lines; the round artifact records the numbers and the
  * adopt/defer decision.
  */
object RowGroupBloomProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(8000000L)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) bytesRead.addAndGet(m.inputMetrics.bytesRead)
      }
    })

    val base = "/root/repo/target/rowgroup_probe/v1"
    val hexId = lower(hex(xxhash64(col("id"), lit(99))))
    def gen = spark.range(0, rows, 1, 8)
      .select(col("id"), hexId.as("id_hex"),
        (col("id") % 1000).as("bucket"),
        concat(lit("payload "), col("id"),
          lit(" abcdefghijklmnopqrstuvwxyz0123456789")).as("pad"))

    def writeVariant(name: String, bloom: Boolean): String = {
      val dir = s"$base/$name"
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        var w = gen.coalesce(1).write.mode("overwrite")
          .option("compression", "zstd")
          .option("parquet.block.size", graft.store.LogStore.ParquetRowGroupBytes)
        if (bloom) {
          w = w.option("parquet.bloom.filter.enabled", "false")
            .option("parquet.bloom.filter.enabled#id_hex", "true")
            .option("parquet.bloom.filter.expected.ndv#id_hex",
              String.valueOf(rows))
        }
        w.parquet(dir)
      }
      dir
    }
    val plain = writeVariant("plain", bloom = false)
    val bloomed = writeVariant("bloom", bloom = true)

    // the needle: one real value in the middle of the file
    val needle = spark.read.parquet(plain).where(col("id") === rows * 7 / 9)
      .select("id_hex").collect()(0).getString(0)
    println(s"ROWGROUP needle=$needle rows=$rows")
    def fileInfo(dir: String): Unit = {
      val fs = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      println(s"ROWGROUP $dir file_bytes=${fs.map(_.length()).sum} files=${fs.length}")
    }
    fileInfo(plain); fileInfo(bloomed)

    def measure(label: String, dir: String, v: String): Unit = {
      // fresh reads each rep (no caching of row-group verdicts in Spark)
      val times = (1 to 3).map { _ =>
        bytesRead.set(0)
        val t0 = System.nanoTime()
        val n = spark.read.parquet(dir).where(col("id_hex") === v).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // drain listener
        (sec, bytesRead.get, n)
      }
      val med = times.sortBy(_._1).apply(1)
      println(f"ROWGROUP $label wall=${med._1}%.3f bytes_read=${med._2} matched=${med._3}")
    }
    measure("plain_hit   ", plain, needle)
    measure("bloom_hit   ", bloomed, needle)
    measure("plain_miss  ", plain, "ffffffffffffffff0")
    measure("bloom_miss  ", bloomed, "ffffffffffffffff0")
    spark.stop()
  }
}
