package graft.tools
import org.apache.spark.sql.SparkSession

/** Why is a noop job ~100ms? Fresh session vs a session that has run
  * many queries — isolates GC/session-state accumulation from the
  * intrinsic local-mode scheduling floor. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(k: Int): Seq[Double] = Seq.fill(k) {
      val t0 = System.nanoTime(); spark.range(1).count(); (System.nanoTime()-t0)/1e6
    }
    noop(3)
    val fresh = noop(9).sorted
    println(f"fresh session noop: median=${fresh(4)}%6.1fms min=${fresh.head}%6.1fms")
    // run a representative slice of the suite to dirty the JVM
    val names = graft.SparkEntry.queries.keys.toSeq.sorted.take(40)
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    val dirty = noop(9).sorted
    println(f"after 40 queries noop: median=${dirty(4)}%6.1fms min=${dirty.head}%6.1fms")
    System.gc(); Thread.sleep(500)
    val postGc = noop(9).sorted
    println(f"after System.gc noop: median=${postGc(4)}%6.1fms min=${postGc.head}%6.1fms")
    val mem = Runtime.getRuntime
    println(s"heap used MB: ${(mem.totalMemory - mem.freeMemory) / (1 << 20)}")
    spark.stop()
  }
}
