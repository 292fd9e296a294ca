package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-decomposition of FieldBloom.candidateFiles' cached-path latency
  * (the f1000 fixture measured ~90ms where MsgBloom's equivalent is
  * ~7ms) — times each sub-step to find the fixed cost. */
object FieldBloomLatProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.store.{FieldBloom, LogStore, MsgBloom}
    val dir = "/root/repo/target/fieldbloom_scale/manifest/f1000"
    sys.props("graft.bloom.manifestCap") = String.valueOf(1L << 40)
    def t[A](label: String)(f: => A): A = {
      val ts = Seq.fill(7) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"[lat] $label%-22s median=${ts(3)}%8.2fms")
      f
    }
    t("manifest")(FieldBloom.manifest(dir))
    t("tokenHashes")(MsgBloom.tokenHashes(spark, Seq("zeta", "r3")))
    t("logstore.read")(LogStore.read(spark, dir))
    t("inputFiles")(LogStore.read(spark, dir).inputFiles.length)
    t("candidateFiles")(FieldBloom.candidateFiles(spark, dir,
      Map("level" -> Seq("zeta-needle-absent"), "region" -> Seq("r3"))))
    spark.stop()
  }
}
