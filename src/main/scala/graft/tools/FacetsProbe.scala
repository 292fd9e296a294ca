package graft.tools
import org.apache.spark.sql.SparkSession

/** Facets sidecar-assist probe (round-12 verdict ask #2): wall time of
  * `* | facets` over the events store, assisted vs full-scan, at the
  * given SF. Prints one JSON line for FACETS_PROBE_r12.json. */
object FacetsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCallSite("graft")
    val dir = graft.store.LogStore.ensureFromEvents(spark, sfDir)
    val q = "* | facets 5"
    def run(assist: Boolean): (Double, Long, Long) = {
      spark.conf.set("spark.graft.facets.assist", assist.toString)
      val a0 = graft.store.FieldNameMeta.facetsAssisted.get
      def once(): Long = {
        val logs = graft.store.LogStore.read(spark, dir)
        graft.logql.Compiler.run(logs, q).count()
      }
      val rows = once() // warm (plan + codegen)
      val ts = Seq.fill(5) {
        val t = System.nanoTime(); once(); (System.nanoTime()-t)/1e6
      }.sorted
      spark.conf.unset("spark.graft.facets.assist")
      (ts(2), rows, graft.store.FieldNameMeta.facetsAssisted.get - a0)
    }
    val (fullMs, rowsF, a1) = run(assist = false)
    val (assistMs, rowsA, a2) = run(assist = true)
    require(rowsF == rowsA, s"row mismatch: $rowsF vs $rowsA")
    require(a1 == 0 && a2 > 0, s"assist counters: off=$a1 on=$a2")
    println(s"""{"sf":"$sfDir","query":"$q","rows":$rowsA,""" +
      s""""full_scan_ms":$fullMs,"assisted_ms":$assistMs,""" +
      s""""speedup":${fullMs / assistMs}}""")
    spark.stop()
  }
}
