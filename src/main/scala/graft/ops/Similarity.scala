package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`Array[Float]`).
  *
  * - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *   set against the corpus scan; one shuffle for the per-query top-k.
  * - [[lshTopK]]: random-hyperplane LSH — corpus bucketed by sign bits;
  *   queries probe only their bucket(s). The scale path: bucket count grows
  *   with corpus size, probe cost stays ~corpus/2^bits per query.
  */
object Similarity {

  /** Sequential fold dot product (deterministic order, codegen'd). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k: for each row of `queries`, the k nearest rows of
    * `corpus`. Queries are broadcast (must be small); corpus streams. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     queryId: String, queryVec: String,
                     corpusId: String, corpusVec: String, k: Int): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random unit hyperplanes: components derived from
    * xxhash of (plane, dim) — no RNG state, reproducible across executors. */
  private def hyperplaneBit(v: Column, plane: Int, dim: Int): Column = {
    // h(plane, j) in [-1, 1): hash-driven constant per (plane, dim-index)
    val comps = transform(sequence(lit(0), lit(dim - 1)),
      j => (pmod(xxhash64(lit(plane), j), lit(2000001L)).cast("double") / 1000000d) - 1d)
    when(dot(v, comps) >= 0, 1L).otherwise(0L)
  }

  /** Sign-bit bucket id from `bits` random hyperplanes. */
  def lshBucket(v: Column, bits: Int, dim: Int): Column =
    (0 until bits).map(p => hyperplaneBit(v, p, dim) * (1L << p))
      .reduce((a, b) => a + b)

  /** LSH-bucketed ANN: join queries to corpus within the same hyperplane
    * bucket, then exact cosine top-k inside the bucket. Recall is tuned by
    * `bits` (fewer bits → bigger buckets → higher recall, more compute). */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              queryId: String, queryVec: String,
              corpusId: String, corpusVec: String,
              k: Int, bits: Int, dim: Int): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"),
      lshBucket(col(queryVec), bits, dim).as("bucket"))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"),
      lshBucket(col(corpusVec), bits, dim).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
