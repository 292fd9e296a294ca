package graft.tools
import org.apache.spark.sql.SparkSession

/** Pins the round-11 claim "field_names wall time is independent of store
  * row count": builds the events store at two scale factors (10× row
  * delta), then times `* | field_names` end to end — compile (including
  * the FieldNameMeta sidecar read + part-predicate evaluation) plus
  * collect. With the sidecar serving, both scales pay the same
  * metadata-only cost; the scan fallback (forced via a projection) shows
  * the row-bound times the sidecar replaces. */
object FieldNamesProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.col
    val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val out = sfs.map { sf =>
      val dir = graft.store.LogStore.ensureFromEvents(spark, sf)
      val logs = graft.store.LogStore.read(spark, dir)
      val rows = logs.count()
      def time(body: => Long): Double = {
        body // warm (parquet footers, codegen)
        val ts = Seq.fill(5) {
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
        }.sorted
        ts(2)
      }
      val servedBefore = graft.store.FieldNameMeta.served.get
      val metaMs = time(graft.logql.Compiler.run(logs, "* | field_names")
        .collect().length.toLong)
      val served = graft.store.FieldNameMeta.served.get - servedBefore
      // projection breaks the pristine-scan shape → scan fallback
      val scanMs = time(graft.logql.Compiler.run(
        logs.select(logs.columns.map(col).toSeq: _*), "* | field_names")
        .collect().length.toLong)
      f"""{"sf":"$sf","rows":$rows,"meta_ms":$metaMs%.1f,"scan_ms":$scanMs%.1f,"served":$served}"""
    }
    println(s"""{"probe":"field_names_scale","runs":[${out.mkString(",")}]}""")
    spark.stop(); System.exit(0)
  }
}
