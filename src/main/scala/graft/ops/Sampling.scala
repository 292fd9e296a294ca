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

  /** Resample to a target domain MIXTURE (the LLaMA/GPT data-recipe
    * stage: "web 60%, code 20%, books 20%"): pick the largest output size
    * whose per-domain demand stays within `maxRepeats` passes over that
    * domain, then deterministically downsample over-represented domains
    * (key-hash filter, no RNG) and epoch-repeat under-represented ones
    * (whole extra passes plus a hash-selected partial pass; the output
    * carries an `__epoch` column so repeated rows stay distinguishable
    * for shuffling/packing downstream).
    *
    * Scale shape: one small per-domain count aggregate (rows = #domains —
    * driver-safe by construction), then a single scan with a per-domain
    * filter/explode; no shuffle beyond the count. Deterministic in
    * `keyCol`, so re-runs and retried partitions agree. */
  def mixture(df: DataFrame, domainCol: String, keyCol: Column,
              targets: Map[String, Double],
              maxRepeats: Int = 4): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "mixture targets must be positive")
    val wSum = targets.values.sum
    val p = targets.map { case (d, w) => d -> w / wSum } // normalize
    // target keys are strings — compare against the STRING form of the
    // domain column so an int/long domain id neither crashes the
    // getString below nor relies on implicit isin coercion
    val dom = col(domainCol).cast("string")
    val counts = df.filter(dom.isin(targets.keys.toSeq: _*))
      .groupBy(dom.as("__dom")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = p.keySet -- counts.keySet
    require(missing.isEmpty, s"mixture domains absent from data: $missing")
    // largest total N with demand_d = p_d * N <= n_d * maxRepeats for all d
    val total = p.map { case (d, pd) => counts(d) * maxRepeats / pd }.min
    val perDomain = p.map { case (d, pd) => d -> (pd * total) }
    // per-domain epoch plan: `full` whole passes + one partial pass
    // keeping `frac` of rows — encoded in the plan as literals
    val plans = perDomain.map { case (d, want) =>
      val n = counts(d).toDouble
      val full = math.floor(want / n).toInt
      val frac = (want - full * n) / n
      (d, full, frac)
    }.toSeq
    val keyBucket = pmod(xxhash64(keyCol), lit(1000000))
    // one scan: each row's epoch list = 0..full-1 always, plus epoch
    // `full` when its hash bucket falls under the partial fraction
    val epochs = plans.foldLeft(lit(null).cast("array<int>")) {
      case (acc, (d, full, frac)) =>
        when(dom === d,
          filter(sequence(lit(0), lit(full)), e =>
            e < full || keyBucket < lit((frac * 1000000).toLong))
        ).otherwise(acc)
    }
    df.withColumn("__epochs", epochs)
      .filter(col("__epochs").isNotNull && size(col("__epochs")) > 0)
      .withColumn("__epoch", explode(col("__epochs")))
      .drop("__epochs")
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al.,
    * arXiv:2302.03169): score each raw-corpus document by how much its
    * hashed n-gram distribution looks like the TARGET corpus rather than
    * the raw corpus, log w(doc) = Σ_grams log(p_target[b] / p_raw[b])
    * over hashed feature buckets b, with add-α smoothing. High-weight
    * docs are the ones to keep when curating pretraining data toward a
    * target domain.
    *
    * Scale shape: one exploded-gram aggregation per corpus with map-side
    * partial combine (bucket tables have at most `buckets` rows — tiny),
    * corpus totals as broadcast 1-row cross joins, a broadcast join of
    * the log-ratio table back onto the raw corpus's exploded grams, and
    * a per-doc sum. No all-pairs, no driver collect at all, no window.
    * Deterministic: xxhash64 bucketing, no RNG — the paper
    * resamples with Gumbel noise, here selection is a deterministic
    * top-fraction by weight (callers wanting sampled diversity can add
    * seeded noise to `logw` themselves).
    *
    * Returns (idCol, n_grams, logw) — one row per raw doc with at least
    * one n-gram. */
  def dsirWeights(raw: DataFrame, target: DataFrame, textCol: String,
                  idCol: String, n: Int = 2, buckets: Int = 10000,
                  smoothing: Double = 0.01): DataFrame = {
    require(buckets > 0 && smoothing > 0, "need buckets > 0, smoothing > 0")
    def grams(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+
        explode(graft.functions.Shingles.shingles(col(textCol), n)).as("__g"): _*)
        .withColumn("__b", pmod(xxhash64(col("__g")), lit(buckets.toLong)))
    // per-bucket smoothed log-prob table; the corpus total rides along as
    // a broadcast 1-row cross join, so the whole weight computation stays
    // one lazy plan — no driver collect, no extra jobs
    def bucketLogP(df: DataFrame, name: String): (DataFrame, DataFrame) = {
      val c = grams(df).groupBy("__b").agg(count(lit(1)).as("__c"))
      // coalesce: a corpus with zero n-grams (every doc shorter than n)
      // must yield the defined all-floor limit, not NULL weights (sum
      // over zero rows is NULL)
      val tot = c.agg(coalesce(sum("__c").cast("double"), lit(0d))
        .as(s"${name}_tot"))
      (c.crossJoin(broadcast(tot))
        .select(col("__b"),
          log((col("__c") + smoothing) /
            (col(s"${name}_tot") + smoothing * buckets)).as(name)),
        tot)
    }
    val (pt, ptTot) = bucketLogP(target, "__lpt")
    val (pr, prTot) = bucketLogP(raw, "__lpr")
    // smoothing floors for buckets absent from one side, derived from the
    // same 1-row totals
    val floors = prTot.crossJoin(ptTot).select(
      log(lit(smoothing) / (col("__lpr_tot") + smoothing * buckets)).as("__prf"),
      log(lit(smoothing) / (col("__lpt_tot") + smoothing * buckets)).as("__ptf"))
    // bucket log-ratio table: <= `buckets` rows, broadcast onto the scan
    val ratio = pr.join(pt, Seq("__b"), "full_outer")
      .crossJoin(broadcast(floors))
      .select(col("__b"),
        (coalesce(col("__lpt"), col("__ptf")) -
         coalesce(col("__lpr"), col("__prf"))).as("__lr"))
    grams(raw, col(idCol))
      .join(broadcast(ratio), Seq("__b"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
           sum(coalesce(col("__lr"), lit(0d))).as("logw"))
  }
}
