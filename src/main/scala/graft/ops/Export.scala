package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-set export: deterministic global shuffle into N shards.
  *
  * The last step of a data pipeline is "write the dataset as N shards in
  * a reproducibly-random order" — downstream loaders stream shards
  * round-robin, so inter- and intra-shard order must both be seeded,
  * not arbitrary. Hash-based assignment makes the shuffle a pure
  * function of (id, seed): re-running on the same input reproduces the
  * exact same shards, and changing the seed re-deals every row.
  *
  * Scale shape: one repartition on the shard key (the only shuffle) with
  * an intra-partition sort — no global orderBy, no driver collection.
  * Shard counts are balanced by the hash (±√ deviation), never skewed by
  * a hot key, because the hash input is the unique id.
  */
object Export {

  /** Assign each row a shard and a within-shard position: `__shard` =
    * xxhash64(id, seed) mod n, `__pos` = xxhash64(id, seed+1). Rows land
    * physically clustered by shard and sorted by position, so a
    * `partitionBy("__shard")` write streams each shard in its final
    * order. */
  def shuffledShards(df: DataFrame, idCol: String, numShards: Int,
                     seed: Long): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    df.withColumn("__shard",
        pmod(xxhash64(col(idCol), lit(seed)), lit(numShards.toLong)))
      .withColumn("__pos", xxhash64(col(idCol), lit(seed + 1)))
      .repartition(numShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__pos"))
  }

  /** Write the shuffled shards as parquet under `dir/shard=K/`. */
  def writeShards(df: DataFrame, idCol: String, numShards: Int,
                  seed: Long, dir: String): Unit =
    shuffledShards(df, idCol, numShards, seed)
      .withColumnRenamed("__shard", "shard")
      .drop("__pos")
      .write.mode("overwrite")
      .option("compression", graft.store.LogStore.ParquetCodec)
      .partitionBy("shard")
      .parquet(dir)
}
