package graft.tools

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** r15 single-threaded microbench of the per-row text kernels over the
  * real sf0.1 documents corpus — isolates kernel cost from all Spark
  * scheduling/plan noise (the WindowKernelBench pattern). Used to A/B the
  * byte-direct UTF-8 rewrites: at sf0.1 the dedup queries cap their doc
  * counts, so kernel wins are invisible under the bench's per-query job
  * floor — this probe and OpsScaleProbe are where per-row cost actually
  * shows. The `old*` variants are verbatim copies of the r14 kernels
  * (String-decoding, XxHash64Function dispatch, per-bit simhash vote),
  * kept here for in-binary A/B like WindowKernelBench.oldCounts. */
object KernelBench15 {

  // ---- r14 kernels, verbatim, for A/B ----
  private def isWordCp(cp: Int): Boolean = {
    if (cp == '_') true
    else if (Character.isLetter(cp)) true
    else {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }
  }

  def oldTokens(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[Any]()
    var i = 0
    var runStart = -1
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      val w = isWordCp(cp)
      if (w && runStart < 0) runStart = i
      if (!w && runStart >= 0) {
        out.add(UTF8String.fromString(s.substring(runStart, i))); runStart = -1
      }
      i += Character.charCount(cp)
    }
    if (runStart >= 0) out.add(UTF8String.fromString(s.substring(runStart, len)))
    new GenericArrayData(out.toArray)
  }

  def oldShingles(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var runStart = -1
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      val w = isWordCp(cp)
      if (w && runStart < 0) runStart = i
      val step = Character.charCount(cp)
      if (!w && runStart >= 0) { starts.add(runStart); ends.add(i); runStart = -1 }
      i += step
    }
    if (runStart >= 0) { starts.add(runStart); ends.add(len) }
    val m = starts.size()
    val count = math.max(m - n, 0) + 1
    val seen = new java.util.LinkedHashSet[String](count * 2)
    val sb = new java.lang.StringBuilder(32)
    var k = 0
    while (k < count) {
      sb.setLength(0)
      var j = k
      val hi = math.min(k + n, m)
      while (j < hi) {
        if (j > k) sb.append(' ')
        sb.append(s, starts.get(j), ends.get(j))
        j += 1
      }
      seen.add(sb.toString)
      k += 1
    }
    val out = new Array[Any](seen.size())
    var o = 0
    val it = seen.iterator()
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  def oldCharWindowHashes(text: UTF8String, k: Int): Array[Long] = {
    if (k <= 0) return Array.emptyLongArray
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n < k) return Array.emptyLongArray
    val cps = new Array[Int](n)
    var i = 0; var o = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(o) = cp; o += 1
      i += Character.charCount(cp)
    }
    val RollBase = 0x100000001b3L
    def fmix64(x0: Long): Long = {
      var x = x0
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33
      x
    }
    var bk = 1L
    var e = 0
    while (e < k) { bk *= RollBase; e += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    var j = 0
    while (j < n) {
      h = h * RollBase + fmix64(cps(j).toLong)
      if (j >= k) h -= bk * fmix64(cps(j - k).toLong)
      if (j >= k - 1) out(j - k + 1) = h
      j += 1
    }
    out
  }

  def oldMinhashSig(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                    numHashes: Int): GenericArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h1 = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var seed = 0
        while (seed < numHashes) {
          val h = XxHash64Function.hash(seed, IntegerType, h1)
          if (h < mins(seed)) mins(seed) = h
          seed += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      out(k) = if (any) java.lang.Long.valueOf(mins(k)) else null
      k += 1
    }
    new GenericArrayData(out)
  }

  def oldSimhash64(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def oldTextStats(text: UTF8String): AnyRef = {
    import graft.functions.TextStatsKernel._
    val s = text.toString
    val len = s.length
    var i = 0
    var nTokens = 0L
    var tokStart = -1
    var han = false
    val counts = new Array[Int](3)
    val stopLang = {
      val m = new java.util.HashMap[String, java.lang.Integer]()
      enStop.foreach(m.put(_, Int.box(0)))
      esStop.foreach(m.put(_, Int.box(1)))
      deStop.foreach(m.put(_, Int.box(2)))
      m
    }
    val maxStopLen = (enStop ++ esStop ++ deStop).map(_.length).max
    def isWordCp(cp: Int): Boolean =
      Character.isLetter(cp) || cp == '_' || {
        val t = Character.getType(cp)
        t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
          t == Character.OTHER_NUMBER
      }
    def endToken(end: Int): Unit = {
      nTokens += 1L
      if (end - tokStart <= maxStopLen) {
        val lang = stopLang.get(s.substring(tokStart, end))
        if (lang != null) counts(lang.intValue) += 1
      }
      tokStart = -1
    }
    while (i < len) {
      val cp = s.codePointAt(i)
      if (isWordCp(cp)) {
        if (tokStart < 0) tokStart = i
        if (!han && Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN)
          han = true
      } else {
        if (tokStart >= 0) endToken(i)
        if (!han && Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN)
          han = true
      }
      i += Character.charCount(cp)
    }
    if (tokStart >= 0) endToken(len)
    java.lang.Long.valueOf(nTokens + counts.sum + (if (han) 1 else 0))
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val texts = spark.read.parquet(s"$d/documents.parquet")
      .select("text").collect().map(r => UTF8String.fromString(r.getString(0)))
    spark.stop()
    println(s"docs=${texts.length} totalChars=${texts.map(_.numChars()).sum}")
    def bench(name: String)(f: UTF8String => Any): Unit = {
      var sink = 0L
      (0 until 3).foreach(_ => texts.foreach(t => sink ^= f(t).hashCode()))
      val runs = (0 until 7).map { _ =>
        val t0 = System.nanoTime()
        texts.foreach(t => sink ^= f(t).hashCode())
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$name%-26s median=${runs(3)}%8.2f ms  min=${runs.head}%8.2f  [$sink%x]")
    }
    import graft.functions.{MinHashSim, Shingles}
    // precomputed token/shingle arrays for the array-input kernels, so
    // their rows measure ONLY the kernel, not tokenization
    val tokenArrs = texts.map(Shingles.tokensEval)
    val shingleArrs = texts.map(t => Shingles.shinglesEval(t, 3))
    bench("tokens NEW")(Shingles.tokensEval)
    bench("tokens OLD")(oldTokens)
    bench("shingles(3) NEW")(t => Shingles.shinglesEval(t, 3))
    bench("shingles(3) OLD")(t => oldShingles(t, 3))
    bench("charWindows(24) NEW")(t => Shingles.charWindowHashesRaw(t, 24))
    bench("charWindows(24) OLD")(t => oldCharWindowHashes(t, 24))
    bench("windowCounts(c,24) NEW")(t =>
      Shingles.windowHashCountsEval(t, 24, chars = true))
    var i1 = -1; var i2 = -1; var i3 = -1; var i4 = -1
    bench("textStats NEW")(graft.functions.TextStatsKernel.eval)
    bench("textStats OLD")(oldTextStats)
    bench("qualityCounts NEW")(graft.functions.TextStatsKernel.qualityCountsEval)
    bench("simhash64 NEW") { _ =>
      i1 = (i1 + 1) % tokenArrs.length
      java.lang.Long.valueOf(MinHashSim.simhash64Eval(tokenArrs(i1)))
    }
    bench("simhash64 OLD") { _ =>
      i2 = (i2 + 1) % tokenArrs.length
      java.lang.Long.valueOf(oldSimhash64(tokenArrs(i2)))
    }
    bench("minhashSig128 NEW") { _ =>
      i3 = (i3 + 1) % shingleArrs.length
      MinHashSim.minhashSigEval(shingleArrs(i3), 128)
    }
    bench("minhashSig128 OLD") { _ =>
      i4 = (i4 + 1) % shingleArrs.length
      oldMinhashSig(shingleArrs(i4), 128)
    }
    // sanity: NEW values == OLD values on the real corpus (the property
    // tests pin this on generated inputs; this pins it on the fixture)
    val neq = texts.count { t =>
      val a = Shingles.tokensEval(t); val b = oldTokens(t)
      a.numElements() != b.numElements() ||
        (0 until a.numElements()).exists(j =>
          !a.getUTF8String(j).equals(b.getUTF8String(j)))
    } + tokenArrs.count(a =>
      MinHashSim.simhash64Eval(a) != oldSimhash64(a)) +
      shingleArrs.count { a =>
        val x = MinHashSim.minhashSigEval(a, 128)
        val y = oldMinhashSig(a, 128)
        (0 until 128).exists(j => x.isNullAt(j) != y.isNullAt(j) ||
          (!x.isNullAt(j) && x.getLong(j) != y.getLong(j)))
      } + texts.count(t => !java.util.Arrays.equals(
        Shingles.charWindowHashesRaw(t, 24), oldCharWindowHashes(t, 24)))
    println(s"value mismatches vs r14 kernels: $neq (must be 0)")
  }
}
