package graft.tools

import org.apache.spark.unsafe.types.UTF8String

/** Single-threaded microbench of the ExactSubstr window kernels over the
  * real sf0.1 documents corpus — isolates per-row kernel cost from all
  * Spark scheduling/plan noise (used to tune windowHashCountsEval). */
object WindowKernelBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val texts = spark.read.parquet(s"$d/documents.parquet")
      .select("text").collect().map(r => UTF8String.fromString(r.getString(0)))
    spark.stop()
    println(s"docs=${texts.length} totalChars=${texts.map(_.numChars()).sum}")
    def bench(name: String)(f: UTF8String => AnyRef): Unit = {
      var sink = 0L
      (0 until 3).foreach(_ => texts.foreach(t => sink ^= f(t).hashCode()))
      val runs = (0 until 7).map { _ =>
        val t0 = System.nanoTime()
        texts.foreach(t => sink ^= f(t).hashCode())
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$name%-28s median=${runs(3)}%8.2f ms  min=${runs.head}%8.2f  [$sink%x]")
    }
    import graft.functions.Shingles
    // round-12's LinkedHashMap rollup, kept for A/B comparison
    def oldCounts(text: UTF8String, k: Int, chars: Boolean): AnyRef = {
      val hs = if (chars) Shingles.charWindowHashesRaw(text, k)
               else Shingles.tokenWindowHashesRaw(text, k)
      val n = hs.length
      val m = new java.util.LinkedHashMap[java.lang.Long, Array[Long]]()
      var i = 0
      while (i < n) {
        val h = java.lang.Long.valueOf(hs(i))
        val c = m.get(h)
        if (c == null) m.put(h, Array(1L)) else c(0) += 1L
        i += 1
      }
      val out = new Array[Any](m.size())
      val it = m.entrySet().iterator()
      var j = 0
      while (it.hasNext) {
        val e = it.next()
        out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](e.getKey.longValue(), e.getValue()(0)))
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    bench("tokenCounts(k=8)")(t => Shingles.windowHashCountsEval(t, 8, chars = false))
    bench("charCounts(k=50)")(t => Shingles.windowHashCountsEval(t, 50, chars = true))
    bench("tokenCountsOld(k=8)")(t => oldCounts(t, 8, chars = false))
    bench("charCountsOld(k=50)")(t => oldCounts(t, 50, chars = true))
    bench("tokenPlain(k=8)")(t => Shingles.tokenWindowHashesEval(t, 8))
    bench("charPlain(k=50)")(t => Shingles.charWindowHashesEval(t, 50))
  }
}
