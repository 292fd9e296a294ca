package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Capped collection aggregates for `values(f) limit N`,
  * `uniq_values(f) limit N` and `json_values(f) limit N`: accumulation
  * stops at the cap (reference stats_values.go / stats_uniq_values.go /
  * stats_json_values.go stop collecting past the limit), so per-group
  * state is bounded by N instead of the group size. Which N values are
  * kept is arbitrary, matching the reference's "any N" contract. */
object CappedCollect {

  private class ListAgg(limit: Int)
      extends Aggregator[String, Seq[String], Seq[String]] {
    def zero: Seq[String] = Nil
    def reduce(b: Seq[String], v: String): Seq[String] =
      if (v != null && b.size < limit) v +: b else b
    def merge(a: Seq[String], b: Seq[String]): Seq[String] =
      if (a.size >= limit) a else a ++ b.take(limit - a.size)
    def finish(b: Seq[String]): Seq[String] = b
    def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
    def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  }

  private class SetAgg(limit: Int)
      extends Aggregator[String, Seq[String], Seq[String]] {
    def zero: Seq[String] = Nil
    def reduce(b: Seq[String], v: String): Seq[String] =
      if (v != null && b.size < limit && !b.contains(v)) v +: b else b
    def merge(a: Seq[String], b: Seq[String]): Seq[String] = {
      var out = a
      val it = b.iterator
      while (out.size < limit && it.hasNext) {
        val v = it.next()
        if (!out.contains(v)) out = v +: out
      }
      out
    }
    // sorted for output stability (stats_uniq_values.go sorts its final set)
    def finish(b: Seq[String]): Seq[String] = b.sorted
    def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
    def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  }

  def cappedList(c: Column, limit: Int): Column =
    udaf(new ListAgg(limit), Encoders.STRING)(c)

  def cappedSet(c: Column, limit: Int): Column =
    udaf(new SetAgg(limit), Encoders.STRING)(c)

  // array-input variants for wildcard field filters (one row contributes a
  // whole per-row value array); state stays bounded by the limit exactly
  // like the scalar forms

  private class ListArrAgg(limit: Int)
      extends Aggregator[Seq[String], Seq[String], Seq[String]] {
    def zero: Seq[String] = Nil
    def reduce(b: Seq[String], vs: Seq[String]): Seq[String] =
      if (vs == null || b.size >= limit) b
      else b ++ vs.filter(_ != null).take(limit - b.size)
    def merge(a: Seq[String], b: Seq[String]): Seq[String] =
      if (a.size >= limit) a else a ++ b.take(limit - a.size)
    def finish(b: Seq[String]): Seq[String] = b
    def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
    def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  }

  private class SetArrAgg(limit: Int)
      extends Aggregator[Seq[String], Seq[String], Seq[String]] {
    def zero: Seq[String] = Nil
    def reduce(b: Seq[String], vs: Seq[String]): Seq[String] = {
      if (vs == null) return b
      var out = b
      val it = vs.iterator
      while (out.size < limit && it.hasNext) {
        val v = it.next()
        if (v != null && !out.contains(v)) out = v +: out
      }
      out
    }
    def merge(a: Seq[String], b: Seq[String]): Seq[String] = {
      var out = a
      val it = b.iterator
      while (out.size < limit && it.hasNext) {
        val v = it.next()
        if (!out.contains(v)) out = v +: out
      }
      out
    }
    def finish(b: Seq[String]): Seq[String] = b.sorted
    def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
    def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  }

  def cappedListOfArrays(c: Column, limit: Int): Column =
    udaf(new ListArrAgg(limit), ExpressionEncoder[Seq[String]]())(c)

  def cappedSetOfArrays(c: Column, limit: Int): Column =
    udaf(new SetArrAgg(limit), ExpressionEncoder[Seq[String]]())(c)
}
