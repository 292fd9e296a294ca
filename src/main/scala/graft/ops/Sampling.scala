package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-mixing helpers for training pipelines. */
object Sampling {

  /** Deterministic stratified sample: up to `k` rows per stratum, chosen
    * by a stable pseudo-random order (`orderCol` — typically a hash of the
    * row key, so the same corpus always yields the same sample and
    * re-runs are reproducible). The per-stratum `row_number` window
    * partitions by the strata columns, so work distributes across strata
    * — no global sort, no single-partition window. */
  def stratified(df: DataFrame, strataCols: Seq[String], k: Int,
                 orderCol: Column): DataFrame =
    df.withColumn("__rn",
        row_number().over(
          Window.partitionBy(strataCols.map(col): _*).orderBy(orderCol)))
      .filter(col("__rn") <= k)
      .drop("__rn")

  /** Proportional downsample to `fraction` per stratum, deterministically:
    * a row survives when its key-hash bucket falls under the fraction —
    * no RNG, stable across runs and partitionings. */
  def downsample(df: DataFrame, keyCol: Column, fraction: Double): DataFrame =
    df.filter(pmod(xxhash64(keyCol), lit(1000000)) < lit((fraction * 1000000).toLong))
}
