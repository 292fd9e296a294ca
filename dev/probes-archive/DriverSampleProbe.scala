package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Sample the driver thread's stack every 2ms during fresh count()s of a
  * warm tiny query; histogram the hottest frames below Dataset.count. */
object DriverSampleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")
    val spark = graft.Sessions.interactive(spark0)
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 50).select(col("doc_id"), col("text"))
    import graft.functions.Shingles.shingles
    val exploded = docs0.select(col("doc_id").as("id"),
      explode(shingles(col("text"), 3)).as("g"))
    val q = exploded.groupBy("g").agg(count(lit(1)).as("c"))
    (1 to 5).foreach(_ => q.count())
    val main = Thread.currentThread()
    val hist = mutable.Map[String, Int]().withDefaultValue(0)
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = main.getStackTrace
        if (st.nonEmpty) {
          // take the deepest interesting frame: skip scala/java plumbing
          val interesting = st.find { f =>
            val c = f.getClassName
            (c.startsWith("org.apache.spark") || c.startsWith("graft")) &&
              !c.contains("DriverSampleProbe")
          }
          interesting.foreach { f =>
            hist.synchronized { hist(f.getClassName + "." + f.getMethodName) += 1 } }
          // also histogram a mid-level frame for context
          val mid = st.filter(f => f.getClassName.startsWith("org.apache.spark.sql"))
            .drop(3).headOption
          mid.foreach { f =>
            hist.synchronized { hist("MID " + f.getClassName + "." + f.getMethodName) += 1 } }
        }
        Thread.sleep(2)
      }
    })
    sampler.setDaemon(true); sampler.start()
    (1 to 40).foreach(_ => q.count())
    sampling = false; sampler.join()
    hist.toSeq.sortBy(-_._2).take(30).foreach { case (k, v) => println(f"$v%5d  $k") }
    spark0.stop()
  }
}
