package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal for the LLM-pipeline operators — the dedup/ANN/text
  * counterpart to [[ScaleProbe]]'s LogsQL store rehearsal. Generates a
  * deterministic synthetic corpus ~100-200× the sf0.1 documents fixture
  * (default 500k docs, 500k 64-dim embeddings; every token and vector
  * component derives from xxhash64 of the row id) with PLANTED near-dups
  * (every 50th doc repeats its predecessor plus a 3-token tail, Jaccard
  * ≈ 0.94), then times the flagship ops and checks their recall against
  * the plant. The point is evidence for the 100 TB design claims at a
  * scale where a de-optimized shape (quadratic bucket, unbounded
  * collect, full re-shuffle) visibly blows up rather than hiding under
  * the scheduler floor.
  *
  * Usage: runMain graft.tools.OpsScaleProbe [docs] [vecs]
  */
object OpsScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(500000L)
    val nVecs = args.lift(1).map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Dedup, Similarity, TextAnalysis}

    // ---- deterministic corpus with planted near-dups ----
    // text(id) = 40+((id*7)%40) vocab words drawn by xxhash(base,pos);
    // every 50th doc re-derives its predecessor's text and appends a
    // 3-token tail → a planted near-dup pair (id-1, id), J ≈ L/(L+3)
    val vocab = array((0 until 500).map(i => lit("w" + i)): _*)
    def textOf(base: org.apache.spark.sql.Column) = concat_ws(" ",
      transform(sequence(lit(0), lit(39) + pmod(base * 7, lit(40))),
        j => element_at(vocab, (pmod(xxhash64(base, j), lit(500)) + 1).cast("int"))))
    val isDup = col("id") % 50 === 0 && col("id") > 0
    val docsPath = s"/root/repo/target/graft_opsscale/v1/docs$nDocs"
    if (!new java.io.File(s"$docsPath/_SUCCESS").exists()) {
      spark.range(0, nDocs, 1, 64)
        .select(col("id").as("doc_id"),
          when(isDup, concat(textOf(col("id") - 1), lit(" zz zz zz")))
            .otherwise(textOf(col("id"))).as("text"))
        .write.mode("overwrite").parquet(docsPath)
    }
    val docs = spark.read.parquet(docsPath)
    val planted = nDocs / 50 - 1 // ids 50, 100, ... (id 0 excluded)

    def time(label: String)(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"OPSSCALE $label%-26s ${sec}%8.2fs  result=$out")
      (sec, out)
    }

    // 1. codegen'd text-stats kernel over every doc
    val (statsSec, _) = time("text_stats_kernel") {
      graft.ops.TextAnalysis.withQuality(docs, "text")
        .agg(count(lit(1)), avg("quality"), sum("n_tokens"))
        .collect(); nDocs
    }
    println(f"OPSSCALE   -> ${nDocs / statsSec / 1e3}%.0f k docs/s text-stats")

    // 2. exact dedup (hash groupBy)
    time("exact_dedup") {
      docs.agg(countDistinct(col("text"))).collect()(0).getLong(0)
    }

    // 3a. component probes: shingle tower alone, then signatures
    time("shingles_only") {
      docs.select(size(Dedup.shingles(col("text"), 3)).as("k"))
        .agg(sum("k")).collect()(0).getLong(0)
    }
    time("minhash_signatures") {
      docs.select(Dedup.minhashSignature(col("text"), 3, 128).as("sig"))
        .agg(sum(size(col("sig")))).collect()(0).getLong(0)
    }

    // 3. MinHash+LSH candidates — recall of the planted pairs
    val cand = Dedup.minhashLSH(docs, "text", "doc_id", threshold = 0.7)
    val (lshSec, found) = time("minhash_lsh_candidates") {
      cand.filter(col("id_b") === col("id_a") + 1 && col("id_b") % 50 === 0)
        .count()
    }
    println(f"OPSSCALE   -> recall ${found * 100.0 / planted}%.1f%% of $planted planted pairs, ${nDocs / lshSec / 1e3}%.0f k docs/s")

    // 3b. EXACT n-gram Jaccard over the same corpus (round-8 shape: one
    // shuffle of the exploded corpus feeds both the per-doc counts and
    // the bucket build) — must find the same planted pairs exactly
    val (njSec, njFound) = time("ngram_jaccard_pairs") {
      Dedup.ngramJaccard(docs, "text", "doc_id", n = 3, threshold = 0.7)
        .filter(col("id_b") === col("id_a") + 1 && col("id_b") % 50 === 0)
        .count()
    }
    println(f"OPSSCALE   -> exact-jaccard recall ${njFound * 100.0 / planted}%.1f%% of $planted planted pairs, ${nDocs / njSec / 1e3}%.0f k docs/s")

    // 3c. ExactSubstr duplicate spans (round-8 shape: doc-frequency via
    // aggregate + skew-join, no window over the hash) — the planted dup
    // pairs share their predecessor's whole text, so ~2% of docs must
    // report duplicated windows
    time("duplicate_spans_tokens") {
      graft.ops.Dedup.duplicateSpans(docs, "text", "doc_id", k = 8)
        .filter(col("dup_windows") > 0).count()
    }

    // 3d. C4-style unit dedup + reassembly: every planted dup doc shares
    // ALL its units with its predecessor, so ~2× the planted count must
    // come back shortened; hot shared units stress the same skew path
    val (pdSec, pdShort) = time("paragraph_dedup_reassembly") {
      Dedup.paragraphDedup(docs, "text", "doc_id", k = 8)
        .filter(col("n_dropped") > 0).count()
    }
    println(f"OPSSCALE   -> paragraph dedup rewrote $pdShort docs, ${nDocs / pdSec / 1e3}%.0f k docs/s")

    // 4. connected components over the candidates — forced DISTRIBUTED
    // star rounds (maxLocalEdges=0 disables the driver union-find gate)
    time("cc_star_rounds_distributed") {
      Dedup.connectedComponents(cand.select("id_a", "id_b"),
        maxLocalEdges = 0L).count()
    }

    // 4b. mass-duplicate stress: the pathological corpus the bucket caps
    // exist for — 10% of docs are ONE identical text, which without the
    // maxBucketSize cap would put ~n²/100 candidate pairs through a
    // single band bucket. Must complete with bounded fan-out (identical
    // docs are exact-dedup's job; LSH drops the over-cap buckets).
    // stress sizes scale with the corpus (but stay bounded: the stress
    // sections exist to prove the quadratic guards hold, and n/5 already
    // makes an uncapped shape blow up visibly)
    def stressCap(n: Long): Long = math.min(n, math.max(200000L, n / 5))
    locally {
      val stressN = stressCap(nDocs)
      val stress = spark.range(0, stressN, 1, 32)
        .select(col("id").as("doc_id"),
          when(col("id") % 10 === 0, lit("mass duplicated boilerplate " +
            "page body shared across the whole corpus fraction"))
            .otherwise(textOf(col("id"))).as("text"))
      time("mass_duplicate_lsh_stress") {
        Dedup.minhashLSH(stress, "text", "doc_id", threshold = 0.7).count()
      }
    }

    // 4c. embedding mass-duplicate stress (round-10 cap,
    // Dedup.embeddingNearDup maxBucketSize): 10% of vectors are ONE
    // identical embedding — a single hyperplane bucket holds all of them,
    // and without the two-phase count cap the bucket equi-join emits
    // ~(n/10)²/2 cosine pairs. With the cap the bucket drops from BOTH
    // sides and the run stays linear; planted exact-copy pairs among the
    // cold 90% must still be found via their own buckets.
    locally {
      val stressN = stressCap(nVecs)
      val plantN = 500L
      def vecOf(c: org.apache.spark.sql.Column) =
        transform(sequence(lit(0), lit(63)),
          j => ((pmod(xxhash64(c, j), lit(2000)) - 1000) / 1000.0)
            .cast("float"))
      val isPlant = col("vec_id") >= stressN // ids stressN..stressN+plantN
      val base = spark.range(0, stressN + plantN, 1, 32)
        .select(col("id").as("vec_id"),
          when(col("id") % 10 === 0 && col("id") < stressN,
            vecOf(lit(-1L))) // the shared hot vector
            .when(isPlant, vecOf((col("vec_id") - stressN) * 10 + 1)) // copy of a cold id
            .otherwise(vecOf(col("vec_id"))).as("embedding"))
      val (enSec, enFound) = time("embed_neardup_mass_stress") {
        graft.ops.Dedup.embeddingNearDup(base, "embedding", "vec_id",
            threshold = 0.999, dim = 64, maxBucketSize = 10000)
          .filter(col("id_b") >= stressN &&
            col("id_a") === (col("id_b") - stressN) * 10 + 1)
          .count()
      }
      println(f"OPSSCALE   -> cold-bucket exact-copy recall ${enFound * 100.0 / plantN}%.1f%% of $plantN planted, hot bucket capped, ${stressN / enSec / 1e3}%.0f k vecs/s")

      // 4d. SemDeDup mass-duplicate stress (round-10 exact-vector
      // collapse + per-cluster cap): the 20k identical hot vectors land
      // in ONE k-means cell; the (cluster, vector) window collapses them
      // to a single representative before the in-cluster cosine join, so
      // the join is quadratic only in DISTINCT vectors per cell (further
      // hard-capped at maxClusterSize).
      val (sdSec, kept) = time("semantic_dedup_mass_stress") {
        graft.ops.Dedup.semanticDedup(base, "embedding", "vec_id",
          k = 32, threshold = 0.999, maxIter = 5, maxClusterSize = 2000)
          .count()
      }
      // survivors: the hot mass keeps exactly 1 of ~stressN/10; each
      // planted copy-pair keeps one of its two ids
      println(f"OPSSCALE   -> semantic dedup kept $kept of ${stressN + plantN} (expect ${stressN * 9 / 10 + 1}), ${stressN / sdSec / 1e3}%.0f k vecs/s")
    }

    // 5. decontamination against a 1k-doc benchmark slice
    time("decontaminate_vs_1k_bench") {
      graft.ops.TextAnalysis // (kept import used)
      Dedup.contaminated(docs, "text", "doc_id",
        docs.filter(col("doc_id") % 500 === 7).select(col("text")), "text",
        n = 8).count()
    }

    // ---- embeddings: hash-derived 64-dim floats ----
    val vecsPath = s"/root/repo/target/graft_opsscale/v1/vecs$nVecs"
    if (!new java.io.File(s"$vecsPath/_SUCCESS").exists()) {
      spark.range(0, nVecs, 1, 64)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            j => ((pmod(xxhash64(col("id"), j), lit(2000)) - 1000) / 1000.0)
              .cast("float")).as("embedding"))
        .write.mode("overwrite").parquet(vecsPath)
    }
    val vecs = spark.read.parquet(vecsPath)
    val queries = vecs.filter(col("vec_id") < 10)

    // 6. brute-force exact top-10 (ground truth)
    val bf = Similarity.bruteForceTopK(queries, vecs,
      "vec_id", "embedding", "vec_id", "embedding", k = 10)
    var truth: Set[(Long, Long)] = Set.empty
    time("bruteforce_top10_x10q") {
      truth = bf.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.size.toLong
    }

    // 7. IVF index build + probe; recall/latency curve over nprobe (the
    // production tuning axis — uniform random vectors are IVF's worst
    // case, so the curve shows the knob works, not a flattering number).
    // nlist scales ~sqrt(n) clamped at 1024: KMeans training cost is
    // n·nlist·dim·iters, and 10M×3162 cells would make the offline index
    // build dominate the probe's wall budget for no recall gain here.
    val nlist = math.max(64L,
      math.min(1024L, math.sqrt(nVecs.toDouble).toLong)).toInt
    println(s"OPSSCALE ivf nlist=$nlist (n=$nVecs)")
    for (nprobe <- Seq(4, 8, 16, 32)) {
      val ivf = Similarity.ivfTopK(queries, vecs,
        "vec_id", "embedding", "vec_id", "embedding",
        k = 10, nlist = nlist, nprobe = nprobe)
      val (ivfSec, hits) = time(f"ivf_top10_nprobe$nprobe%-3d") {
        ivf.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).count(truth.contains)
      }
      println(f"OPSSCALE   -> IVF nprobe=$nprobe recall@10 ${hits * 100.0 / truth.size}%.1f%% in ${ivfSec}%.2fs")
    }

    // 8. IVF-PQ (m=8 subquantizers, asymmetric distance, exact re-rank of
    // a 50-deep shortlist) — the memory-bound ANN shape for corpora whose
    // raw vectors don't fit: codes are 8 B/vector vs 256 B raw
    locally {
      val ivfpq = Similarity.ivfPqTopK(queries, vecs,
        "vec_id", "embedding", "vec_id", "embedding",
        k = 10, nlist = nlist, nprobe = 16, m = 8, refine = 50)
      val (pqSec, hits) = time("ivfpq_top10_nprobe16") {
        ivfpq.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).count(truth.contains)
      }
      println(f"OPSSCALE   -> IVF-PQ recall@10 ${hits * 100.0 / truth.size}%.1f%% in ${pqSec}%.2fs")
    }
    spark.stop()
  }
}
