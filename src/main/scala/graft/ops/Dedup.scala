package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale notes (100 TB): signatures are pure Column expressions computed in
  * the scan stage; the only shuffles are the LSH band groupBy (keys are
  * band hashes — uniform, no skew) and the candidate-pair join (candidate
  * sets are tiny relative to the corpus). No O(n²) step ever materializes.
  */
object Dedup {

  /** Exact dedup: keep the first row per key (deterministic by tiebreaker). */
  def exact(df: DataFrame, keyCols: Seq[String], tiebreaker: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tiebreaker))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingles of `text`. */
  def shingles(text: Column, n: Int): Column = {
    val ts = TextAnalysis.tokens(text)
    array_distinct(transform(
      sequence(lit(0), greatest(size(ts) - n, lit(0))),
      i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min hash over the shingle set. Pure expression — no shuffle. */
  def minhashSignature(text: Column, n: Int, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingles(text, n), s => xxhash64(s, seed))))

  /** Estimated Jaccard from two signatures: fraction of agreeing positions. */
  def signatureJaccard(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(a)

  /** MinHash + LSH banding: near-duplicate candidate pairs with estimated
    * Jaccard >= threshold.
    *
    * numHashes = bands * rowsPerBand. Collision probability for a pair with
    * true Jaccard s is 1-(1-s^rows)^bands (standard LSH S-curve).
    */
  def minhashLSH(df: DataFrame, textCol: String, idCol: String,
                 shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
                 threshold: Double = 0.7): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = df.select(col(idCol).as("id"),
        minhashSignature(col(textCol), shingleSize, numHashes).as("sig"))
      .withColumn("band", explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band_idx"),
          xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))).as("band_hash")))))
      .select(col("id"), col("sig"), col("band.band_idx"), col("band.band_hash"))
    // pairs sharing any band bucket
    val l = sigs.select(col("band_idx"), col("band_hash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = sigs.select(col("band_idx"), col("band_hash"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        signatureJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .groupBy("id_a", "id_b")
      .agg(first("est_jaccard").as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** 64-bit SimHash over word tokens (per-bit majority of token hashes). */
  def simhash(text: Column): Column = {
    val ts = TextAnalysis.tokens(text)
    val bitSums = aggregate(
      ts,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          b => when(call_function("shiftright", xxhash64(t), b).bitwiseAND(1) === 1, 1).otherwise(-1)),
        (a, v) => a + v))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)),
        (s, b) => when(s > 0, call_function("shiftleft", lit(1L), b)).otherwise(0L)),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-dup candidates: split the 64-bit hash into `bands` chunks;
    * pairs agreeing on any chunk are candidates (Hamming-adjacent dups agree
    * on at least one chunk when distance < bands). */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        bands: Int = 4): DataFrame = {
    val bits = 64 / bands
    val withSh = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
      .withColumn("chunk", explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("chunk_idx"),
          call_function("shiftright", col("sh"), b * bits)
            .bitwiseAND((1L << bits) - 1).as("chunk_val")))))
      .select(col("id"), col("sh"), col("chunk.chunk_idx"), col("chunk.chunk_val"))
    val l = withSh.select(col("chunk_idx"), col("chunk_val"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = withSh.select(col("chunk_idx"), col("chunk_val"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for all pairs above `threshold`,
    * via an inverted shingle index (shingle → docs) — the scalable exact
    * counterpart to MinHash verification. */
  def ngramJaccard(df: DataFrame, textCol: String, idCol: String,
                   n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val docs = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .withColumn("sh_count", size(col("sh")))
    val inverted = docs.select(col("id"), col("sh_count"), explode(col("sh")).as("g"))
    val pairs = inverted.as("a").join(inverted.as("b"), Seq("g"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh_count").as("ca"), col("b.sh_count").as("cb"))
      .agg(count(lit(1)).as("common"))
    pairs.select(col("id_a"), col("id_b"),
        (col("common").cast("double") /
          (col("ca") + col("cb") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding-cosine near-duplicates above `threshold` (delegates to the
    * similarity module's LSH-bucketed join for scale). */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
                       threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
