package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k-by-score aggregate: per-group state is a size-≤k list
  * sorted best-first by (score desc, id asc), maintained through partial
  * aggregation — each task keeps k candidates per group and the shuffle
  * moves O(groups × k) rows. The scalable replacement for
  * `row_number().over(Window.partitionBy(g).orderBy(score.desc))` +
  * `filter(rank <= k)`, which shuffles and sorts EVERY scored row: at a
  * 100 TB corpus × even a handful of queries that window is a
  * billions-of-rows exchange for an answer of a few dozen rows. */
object TopK {

  /** One scored candidate; `id` breaks score ties ascending so results
    * are deterministic and match the window's orderBy(score desc, id).
    * `nul` carries SQL-NULL scores (a null embedding's cosine): the
    * window's desc ordering puts nulls LAST — after every real double,
    * NaN included — so they must stay ranked, not dropped, or a group
    * with fewer than k non-null scores returns different rows than the
    * window this aggregate replaces. */
  final case class Scored(score: Double, id: Long, nul: Boolean)

  // Ordering identical to Spark's `orderBy(score.desc, id.asc)`:
  // null last; then Double.compare, not > — desc ranks NaN ABOVE every
  // other double, and IEEE > is false both ways on NaN and would instead
  // silently drop NaN scores from full buffers
  private def better(a: Scored, b: Scored): Boolean = {
    if (a.nul != b.nul) return !a.nul
    val c = if (a.nul) 0 else java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  private class Agg(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    def zero: Seq[Scored] = Vector.empty

    def reduce(b: Seq[Scored], v: Scored): Seq[Scored] = {
      if (b.size >= k && !better(v, b.last)) return b
      val at = b.indexWhere(x => better(v, x))
      val pos = if (at < 0) b.size else at
      val grown = (b.take(pos) :+ v) ++ b.drop(pos)
      if (grown.size > k) grown.take(k) else grown
    }

    // both sides sorted best-first: bounded two-pointer merge
    def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = {
      val out = Vector.newBuilder[Scored]
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < a.size || j < b.size)) {
        val takeA = j >= b.size || (i < a.size && better(a(i), b(j)))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    def finish(b: Seq[Scored]): Seq[Scored] = b
    def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
    def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  }

  /** `array<struct<score,id,nul>>` of the group's k best rows, best
    * first; read the score as `when(col.nul, null).otherwise(col.score)`
    * to round-trip SQL NULLs (the struct field itself is primitive). */
  def topk(score: Column, id: Column, k: Int): Column = {
    require(k > 0, "topk needs k > 0")
    udaf(new Agg(k), ExpressionEncoder[Scored]())(
      org.apache.spark.sql.functions.coalesce(
        score, org.apache.spark.sql.functions.lit(0d)),
      id, score.isNull)
  }
}
