package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** `histogram(field)` stats function: VictoriaMetrics-style log-bucketed
  * histogram emitting a JSON array of `{"vmrange":"<lo>...<hi>","hits":N}`
  * buckets (reference stats_histogram.go:36-210; bucket scheme from the
  * vendored VictoriaMetrics/metrics histogram.go: 18 buckets per decade
  * across 1e-9..1e18 plus lower/upper overflow buckets).
  *
  * Implemented as a Spark `Aggregator` over a dense 488-slot count array
  * (486 range buckets + lower + upper) — partial aggregation and merge are
  * O(buckets), state is fixed-size per group.
  */
object VmHistogram {

  private val E10Min = -9
  private val E10Max = 18
  private val BucketsPerDecimal = 18
  val BucketsCount: Int = (E10Max - E10Min) * BucketsPerDecimal // 486

  // vmrange strings replicate histogram.go initBucketRanges: bounds built by
  // iterative multiplication from 1e-9, formatted "%.3e"
  private def f3e(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3e", Double.box(v))

  lazy val bucketRanges: Array[String] = {
    val multiplier = math.pow(10, 1.0 / BucketsPerDecimal)
    val out = new Array[String](BucketsCount)
    var v = 1e-9
    var start = f3e(v)
    var i = 0
    while (i < BucketsCount) {
      v *= multiplier
      val end = f3e(v)
      out(i) = start + "..." + end
      start = end
      i += 1
    }
    out
  }
  val lowerBucketRange: String = "0..." + f3e(1e-9)
  val upperBucketRange: String = f3e(1e18) + "...+Inf"

  /** Slot for a value: 0 = lower, 1..486 = range buckets, 487 = upper,
    * -1 = skip (negative/NaN — histogram.go Update). */
  def slotOf(v: Double): Int = {
    if (v.isNaN || v < 0) return -1
    val bucketIdx = (math.log10(v) - E10Min) * BucketsPerDecimal
    if (bucketIdx < 0) 0
    else if (bucketIdx >= BucketsCount) BucketsCount + 1
    else {
      var idx = bucketIdx.toInt
      // 10^n edge values belong to the lower bucket (Prometheus `le` logic)
      if (bucketIdx == idx.toDouble && idx > 0) idx -= 1
      idx + 1
    }
  }

  private def rangeOfSlot(slot: Int): String =
    if (slot == 0) lowerBucketRange
    else if (slot == BucketsCount + 1) upperBucketRange
    else bucketRanges(slot - 1)

  /** Natural-order comparison (stringsutil.LessNatural semantics): decimal
    * digit runs compare numerically, everything else bytewise. */
  def lessNatural(a: String, b: String): Boolean = compareNatural(a, b) < 0

  private def compareNatural(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.charAt(i)
      val cb = b.charAt(j)
      val da = ca >= '0' && ca <= '9'
      val db = cb >= '0' && cb <= '9'
      if (da && db) {
        var i2 = i; while (i2 < a.length && a.charAt(i2).isDigit) i2 += 1
        var j2 = j; while (j2 < b.length && b.charAt(j2).isDigit) j2 += 1
        val runA = a.substring(i, i2)
        val runB = b.substring(j, j2)
        val cmp =
          if (runA.length > 18 || runB.length > 18) runA.compareTo(runB)
          else java.lang.Long.compare(runA.toLong, runB.toLong)
        if (cmp != 0) return cmp
        i = i2; j = j2
      } else if (da) return -1 // digit runs sort before non-digits
      else if (db) return 1
      else {
        if (ca != cb) return Character.compare(ca, cb)
        i += 1; j += 1
      }
    }
    (a.length - i) - (b.length - j)
  }

  private class Agg extends Aggregator[Double, Array[Long], String] {
    def zero: Array[Long] = new Array[Long](BucketsCount + 2)
    def reduce(buf: Array[Long], v: Double): Array[Long] = {
      val s = slotOf(v)
      if (s >= 0) buf(s) += 1
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): String = {
      val entries = buf.indices.filter(buf(_) > 0)
        .map(s => (rangeOfSlot(s), buf(s)))
        .sortWith((x, y) => lessNatural(x._1, y._1))
      // empty histogram renders as "]" — stats_histogram.go:246-254 strips
      // the trailing comma unconditionally, eating the '[' when no buckets
      if (entries.isEmpty) "]"
      else entries.map { case (r, c) => s"""{"vmrange":"$r","hits":$c}""" }
        .mkString("[", ",", "]")
    }
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  private lazy val fn = udaf(new Agg, Encoders.scalaDouble)

  /** Aggregate column: nulls (missing/unparseable values) are skipped. */
  def column(values: Column): Column =
    fn(coalesce(values, lit(Double.NaN)))
}
