package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass "capped id list + exact count" aggregate for inverted-index
  * builds (ngram/ExactSubstr dedup): per shingle bucket, collect member
  * doc ids up to `cap` while counting ALL members. Buckets over the
  * doc-frequency cutoff are later dropped on the exact count, so their
  * (truncated) id arrays are never consumed — per-group state stays
  * bounded by `cap` even for stop-phrase shingles that appear in millions
  * of documents. This is what lets the index build be a SINGLE shuffle of
  * the exploded corpus: the classic two-phase shape (count first, filter,
  * re-join to collect) shuffles the corpus twice and joins it once; this
  * aggregator fuses the count and the bounded collect. */
object CappedIds {

  private class Agg(cap: Int)
      extends Aggregator[Long, (List[Long], Long), (Seq[Long], Long)] {
    def zero: (List[Long], Long) = (Nil, 0L)
    def reduce(b: (List[Long], Long), v: Long): (List[Long], Long) =
      (if (b._2 < cap) v :: b._1 else b._1, b._2 + 1)
    def merge(a: (List[Long], Long), b: (List[Long], Long)): (List[Long], Long) = {
      val ids = if (a._1.size >= cap) a._1
                else a._1 ::: b._1.take(cap - a._1.size)
      (ids, a._2 + b._2)
    }
    def finish(b: (List[Long], Long)): (Seq[Long], Long) = (b._1, b._2)
    def bufferEncoder: Encoder[(List[Long], Long)] =
      ExpressionEncoder[(List[Long], Long)]()
    def outputEncoder: Encoder[(Seq[Long], Long)] =
      ExpressionEncoder[(Seq[Long], Long)]()
  }

  /** Struct column `(_1: array<long> ids, _2: long df)`. `ids` holds an
    * arbitrary `cap`-bounded subset of the group's values; `df` is the
    * exact group size — complete iff `df <= cap`. */
  def idsWithCount(c: Column, cap: Int): Column =
    org.apache.spark.sql.functions.udaf(new Agg(cap), Encoders.scalaLong)(c)

  private class PairAgg(cap: Int)
      extends Aggregator[(Long, Long), (List[(Long, Long)], Long),
                         (Seq[(Long, Long)], Long)] {
    def zero: (List[(Long, Long)], Long) = (Nil, 0L)
    def reduce(b: (List[(Long, Long)], Long), v: (Long, Long)):
        (List[(Long, Long)], Long) =
      (if (b._2 < cap) v :: b._1 else b._1, b._2 + 1)
    def merge(a: (List[(Long, Long)], Long), b: (List[(Long, Long)], Long)):
        (List[(Long, Long)], Long) = {
      val ids = if (a._1.size >= cap) a._1
                else a._1 ::: b._1.take(cap - a._1.size)
      (ids, a._2 + b._2)
    }
    def finish(b: (List[(Long, Long)], Long)): (Seq[(Long, Long)], Long) =
      (b._1, b._2)
    def bufferEncoder: Encoder[(List[(Long, Long)], Long)] =
      ExpressionEncoder[(List[(Long, Long)], Long)]()
    def outputEncoder: Encoder[(Seq[(Long, Long)], Long)] =
      ExpressionEncoder[(Seq[(Long, Long)], Long)]()
  }

  /** Two-long variant of [[idsWithCount]]: struct
    * `(_1: array<struct<_1,_2>> pairs, _2: long df)` — a `cap`-bounded
    * subset of the group's (a, b) value pairs plus the exact group size.
    * Lets a bucket collect (member id, member hash) in the same one-pass
    * capped aggregate the id-only shape uses. */
  def pairsWithCount(a: Column, b: Column, cap: Int): Column =
    org.apache.spark.sql.functions.udaf(new PairAgg(cap),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))(a, b)
}
