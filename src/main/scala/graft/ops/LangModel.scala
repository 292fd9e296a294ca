package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style quality
  * filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data", arXiv:1911.00359): score every document
  * by its negative log-likelihood under a model trained on the corpus
  * itself; documents far above the corpus average are noise (lexically
  * improbable), far below are boilerplate (degenerately probable). The
  * model here is an add-one-smoothed unigram LM — the shape that scales to
  * 100 TB as one count shuffle + one scoring scan.
  *
  * Scale shape: the model is vocab-sized (tokens × one long — millions of
  * rows at web scale, megabytes, broadcast-able; Catalyst/AQE picks the
  * broadcast automatically from plan stats). Training is one explode +
  * one groupBy over uniform token keys; scoring is one explode + one join
  * against the model + one per-doc rollup. Nothing collects to the driver.
  */
object LangModel {

  /** Train: unigram counts over the corpus — (token, cnt). */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  private val modelCache = scala.collection.mutable.LinkedHashMap
    .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String),
           DataFrame]
  private val MaxModels = 8

  /** Memoized trained model: the counts table is index-like state — the
    * CCNet shape trains once and scores many batches against it — so
    * repeat calls over the same corpus reuse the persisted counts instead
    * of re-running the train shuffle. Keyed by the canonicalized corpus
    * plan, bounded, unpersist-on-evict (the IVF/SemDeDup cache pattern). */
  def unigramModel(df: DataFrame, textCol: String): DataFrame = synchronized {
    val key = (df.queryExecution.optimizedPlan.canonicalized, textCol)
    modelCache.get(key) match {
      case Some(m) => m
      case None =>
        val m = unigramCounts(df, textCol)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        modelCache.put(key, m)
        while (modelCache.size > MaxModels) {
          val (oldKey, oldM) = modelCache.head
          oldM.unpersist(blocking = false)
          modelCache.remove(oldKey)
        }
        m
    }
  }

  /** Add-one-smoothed unigram negative log-likelihood of one token count
    * column against (total, vocab) scalars:
    * nll(t) = −ln((cnt(t)+1) / (total+vocab+1)); unseen tokens take cnt=0.
    */
  def tokenNll(cnt: Column, total: Column, vocab: Column): Column =
    -log((coalesce(cnt, lit(0L)) + lit(1.0)) / (total + vocab + lit(1.0)))

  /** Score: one row per (doc, token) with its model NLL — the building
    * block callers aggregate themselves (deterministic-sum pinning, head
    * inspection, per-position diagnostics). Docs with no tokens vanish. */
  def scoreTokens(df: DataFrame, textCol: String, idCol: String,
                  model: DataFrame): DataFrame = {
    val totals = model.agg(sum("cnt").as("__total"),
      count(lit(1)).as("__vocab"))
    df.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .join(model, Seq("token"), "left")
      .crossJoin(broadcast(totals)) // one row
      .select(col("id"), col("token"),
        tokenNll(col("cnt"), col("__total"), col("__vocab")).as("nll"))
  }

  /** Convenience rollup: per-doc token count and mean NLL (≈ ln of
    * perplexity). */
  def docNll(df: DataFrame, textCol: String, idCol: String,
             model: DataFrame): DataFrame =
    scoreTokens(df, textCol, idCol, model)
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), avg("nll").as("avg_nll"))
}
