package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`Array[Float]`).
  *
  * - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *   set against the corpus scan; one shuffle for the per-query top-k.
  * - [[lshTopK]]: random-hyperplane LSH — corpus bucketed by sign bits;
  *   queries probe their own bucket plus `probes-1` Hamming-1 neighbors.
  *   The scale path: bucket count grows with corpus size, probe cost stays
  *   ~probes × corpus/2^bits per query.
  */
object Similarity {

  /** Sequential float dot product — a custom codegen'd Catalyst
    * expression (graft.functions.DotProduct); deterministic order. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass cosine (custom codegen'd expression). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.DotProduct.cosine(a, b)

  /** Rank `scored` rows (query_id, neighbor_id, cos) down to the
    * per-query top-k via the BOUNDED TopK aggregate: partial aggregation
    * keeps k candidates per query per task, so the exchange moves
    * O(queries × k × tasks) rows. A row_number window here would shuffle
    * and sort every scored pair — the thing that dies first at 100 TB.
    * Deterministic: ties break by neighbor_id ascending, identical to
    * `orderBy(cos desc, neighbor_id asc)`. */
  def topKByScore(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy("query_id")
      .agg(graft.functions.TopK.topk(col("cos"), col("neighbor_id"), k).as("__nn"))
      .select(col("query_id"), posexplode(col("__nn")))
      .select(col("query_id"),
        col("col.id").as("neighbor_id"),
        // null-score pairs (null embeddings) rank LAST, like the window's
        // desc NULLS LAST — kept, not dropped, so short groups match
        when(col("col.nul"), lit(null)).otherwise(col("col.score")).as("cos"),
        (col("pos") + 1).cast("int").as("rank"))

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
    topKByScore(scored, k)
  }

  // -------------------------------------------------------- quantization

  /** Symmetric int8 quantization of a float-vector column: per-row scale
    * s = 127 / max|v|, stored beside q = round(v·s) as `tinyint`s. 4×
    * memory/IO reduction for a corpus whose scans are bandwidth-bound —
    * at 100 TB the embedding column is usually the widest thing in the
    * table. Zero vectors keep scale 0 and an all-zero code. Pure Column
    * ops; `transform` stays inside codegen. */
  def quantizeInt8(df: DataFrame, vecCol: String,
                   codeCol: String = "q8", scaleCol: String = "q8_scale"): DataFrame = {
    val mx = array_max(transform(col(vecCol), x => abs(x)))
    val scale = when(mx > 0, lit(127.0) / mx).otherwise(lit(0.0))
    // floor(x·s + 0.5), not round(): Spark's round on doubles goes through
    // a per-element BigDecimal — on a wide embedding column that allocation
    // dominates the whole quantize pass
    df.withColumn(scaleCol, scale.cast("float"))
      .withColumn(codeCol,
        transform(col(vecCol),
          x => floor(x * col(scaleCol) + 0.5d).cast("tinyint")))
  }

  /** Reconstruct approximate floats from an int8 code (v ≈ q / scale). */
  def dequantizeInt8(code: Column, scale: Column): Column =
    when(scale > 0, transform(code, q => (q / scale).cast("float")))
      .otherwise(transform(code, q => lit(0f)))

  /** Cosine top-k over int8-quantized vectors: same shape as
    * bruteForceTopK but the corpus side streams 1-byte codes instead of
    * 4-byte floats (cosine is scale-invariant, so the corpus-side scale
    * cancels and only the code matters — the cosine expression reads the
    * tinyint array directly, no per-pair float materialization). Queries
    * stay float. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame,
                    queryId: String, queryVec: String,
                    corpusId: String, corpusCode: String, k: Int): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
    val c = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusCode).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    topKByScore(scored, k)
  }

  /** Deterministic random hyperplanes, baked into the plan as literal
    * arrays — each row pays `bits` dot products, not a per-row
    * (bits × dim) array construction. */
  private def planes(bits: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(0x6C5A11L)
    Array.fill(bits, dim)(rnd.nextGaussian())
  }

  /** Sign-bit bucket id from `bits` random hyperplanes. */
  def lshBucket(v: Column, bits: Int, dim: Int): Column =
    planes(bits, dim).zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit(_)): _*)
      when(dot(v, planeLit) >= 0, 1L << i).otherwise(0L)
    }.reduce(_ + _)

  /** IVF (inverted-file) ANN: k-means centroids partition the corpus into
    * `nlist` cells (one pass, Spark ML KMeans); each query probes its
    * `nprobe` nearest cells and runs exact cosine top-k inside them. The
    * centroid set is tiny and broadcast-able; per-query cost is
    * ~nprobe/nlist of the corpus. Complements [[lshTopK]] — IVF adapts to
    * clustered data, hyperplane LSH needs no training pass. */
  /** Memoized IVF index per (corpus plan, id/vec cols, nlist): the k-means
    * training pass and the per-row cell assignment run ONCE; queries reuse
    * the broadcast-able centroid set and the materialized cell table. This
    * is the production shape — an ANN index is precomputed state, not
    * something a query rebuilds (re-fitting inside every invocation was
    * the single slowest bench entry). Keyed by the CANONICALIZED PLAN
    * ITSELF (structural equality), not its 32-bit hash — a hash collision
    * would silently serve an index built over a different corpus. Bounded:
    * evicted entries unpersist their cell tables so a long-lived server
    * doesn't pin stale corpora in executor memory. */
  private val ivfCache = scala.collection.mutable.LinkedHashMap
    .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Int),
           (Array[Array[Double]], DataFrame)]
  private val MaxIvfEntries = 8

  def ivfIndex(corpus: DataFrame, corpusId: String, corpusVec: String,
               nlist: Int): (Array[Array[Double]], DataFrame) = synchronized {
    val key = (corpus.queryExecution.optimizedPlan.canonicalized,
      s"$corpusId/$corpusVec", nlist)
    ivfCache.get(key) match {
      case Some(v) => v
      case None =>
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val c0 = corpus.select(col(corpusId).as("neighbor_id"),
          col(corpusVec).as("cv"),
          array_to_vector(col(corpusVec).cast("array<double>")).as("__vec"))
        // coarse cells only need rough centroids: few iterations, cheap init
        val model = new KMeans().setK(nlist).setSeed(7).setMaxIter(5)
          .setInitMode("random")
          .setFeaturesCol("__vec").setPredictionCol("cell").fit(c0)
        val cells = model.transform(c0)
          .select(col("neighbor_id"), col("cv"), col("cell"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val entry = (model.clusterCenters.map(_.toArray), cells)
        ivfCache.put(key, entry)
        while (ivfCache.size > MaxIvfEntries) {
          val (oldKey, (_, oldCells)) = ivfCache.head
          oldCells.unpersist()
          ivfCache.remove(oldKey)
        }
        entry
    }
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              queryId: String, queryVec: String,
              corpusId: String, corpusVec: String,
              k: Int, nlist: Int, nprobe: Int): DataFrame = {
    val (centroids, cells) = ivfIndex(corpus, corpusId, corpusVec, nlist)
    ivfProbe(queries, centroids, cells, queryId, queryVec, k, nprobe)
  }

  /** Probe a prebuilt IVF index — shared by the in-session memoized path
    * and indexes loaded from disk. */
  def ivfProbe(queries: DataFrame, centroids: Array[Array[Double]],
               cells: DataFrame, queryId: String, queryVec: String,
               k: Int, nprobe: Int): DataFrame = {
    // nprobe nearest cells per query, ranked by L2 distance to centroids:
    // ||q-c||^2 = ||q||^2 - 2 q·c + ||c||^2; ||q||^2 is constant per query
    val cellDist = centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - dot(col("qv"), array(c.map(lit(_)): _*)) * 2d).as("d"),
             lit(i).as("cell"))
    }
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .withColumn("cell",
        explode(transform(slice(array_sort(array(cellDist: _*)), 1, nprobe),
          s => s.getField("cell"))))
    val scored = cells.join(broadcast(q), Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    topKByScore(scored, k)
  }

  /** Persist an IVF index to `dir` (centroids + cell assignments as
    * parquet). An ANN index over a 100 TB embedding corpus is
    * corpus-scale state: the k-means pass and the full-corpus cell
    * assignment must be buildable once and reused across sessions and
    * clusters, not re-fit per JVM (the in-memory memoization only helps
    * one driver). Layout: `dir/centroids` (cell, centroid), `dir/cells`
    * (cell, neighbor_id, cv). Two-phase write: both tables land in a
    * temp dir first, then one rename publishes them — a reader never
    * sees a HALF-WRITTEN index, though between replacing an existing
    * index's delete and rename there is a brief no-index window (same
    * contract as the store's compaction swap; loaders retry). */
  def saveIvfIndex(corpus: DataFrame, corpusId: String, corpusVec: String,
                   nlist: Int, dir: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (centroids, cells) = ivfIndex(corpus, corpusId, corpusVec, nlist)
    val tmp = s"$dir.tmp-${java.util.UUID.randomUUID().toString.take(8)}"
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$tmp/centroids")
    cells.write.mode("overwrite").parquet(s"$tmp/cells")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(dir)
    if (fs.exists(dst)) fs.delete(dst, true)
    // rename reports failure via its Boolean — swallowing it would
    // "publish" nothing and leave the next load reading a missing or
    // stale index
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"failed to publish IVF index: rename $tmp -> $dir")
  }

  /** Load a persisted IVF index; the returned pair feeds [[ivfProbe]]. */
  def loadIvfIndex(spark: SparkSession, dir: String): (Array[Array[Double]], DataFrame) = {
    val centroids = spark.read.parquet(s"$dir/centroids")
      .collect().sortBy(_.getAs[Int]("cell"))
      .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray)
    (centroids, spark.read.parquet(s"$dir/cells"))
  }

  /** LSH-bucketed ANN: join queries to corpus within the same hyperplane
    * bucket, then exact cosine top-k inside the bucket. Recall is tuned by
    * `bits` (fewer bits → bigger buckets → higher recall, more compute) and
    * `probes` (each extra probe also searches a Hamming-1 neighbor bucket,
    * recovering pairs split by a single hyperplane). */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              queryId: String, queryVec: String,
              corpusId: String, corpusVec: String,
              k: Int, bits: Int, dim: Int, probes: Int = 1): DataFrame = {
    val bucket = (v: Column) => lshBucket(v, bits, dim)
    val probeBuckets = (v: Column) => {
      val b = bucket(v)
      val all = b +: (0 until math.min(math.max(probes - 1, 0), bits))
        .map(i => b.bitwiseXOR(1L << i))
      explode(array(all: _*))
    }
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"),
      probeBuckets(col(queryVec)).as("bucket"))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"),
      bucket(col(corpusVec)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
      .groupBy("query_id", "neighbor_id")
      .agg(first("cos").as("cos")) // a pair may match via several probes
    topKByScore(scored, k)
  }

  // ------------------------------------------------------------ IVF-PQ

  /** Train per-subspace product-quantization codebooks (Jégou et al.,
    * TPAMI 2011) on a bounded driver-side sample: `m` subspaces × `ksub`
    * centroids each, deterministic Lloyd iterations (evenly-spaced sample
    * init, no RNG). The sample is capped at `sampleN` vectors
    * (4096 × d=64 doubles ≈ 2 MB — the same driver-size class as the
    * broadcast dictionaries the other ops already trust the driver with);
    * codebook quality needs a representative sample, not the corpus.
    * Returns the flat subspace-major codebook `cb[((j*ksub)+c)*dsub + t]`
    * that [[graft.functions.PqKernel]] expects. `d` must divide by `m`. */
  def pqTrain(corpus: DataFrame, vecCol: String, m: Int, ksub: Int = 256,
              sampleN: Int = 4096, iters: Int = 10): Array[Double] = {
    val sample: Array[Array[Double]] = corpus.select(col(vecCol))
      .where(col(vecCol).isNotNull) // null embeddings rank last at query
      .limit(sampleN).collect()     // time; they must not NPE the training
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case other => other.toString.toDouble
      }.toArray)
    require(sample.nonEmpty, "pqTrain: empty corpus sample")
    val d = sample.head.length
    require(m > 0 && d % m == 0, s"pqTrain: dim $d must divide by m=$m")
    val dsub = d / m
    val k = math.min(ksub, sample.length)
    val flat = new Array[Double](m * ksub * dsub)
    for (j <- 0 until m) {
      def sub(i: Int): Array[Double] =
        java.util.Arrays.copyOfRange(sample(i), j * dsub, (j + 1) * dsub)
      // init: deterministic farthest-point (maxmin) seeding — evenly
      // spaced indices can alias with periodic structure in the sample
      // (every picked row from the same cluster) and collapse the
      // codebook; maxmin spreads centroids by construction, no RNG
      val cents = new Array[Array[Double]](k)
      cents(0) = sub(0)
      val minD = Array.fill(sample.length)(Double.MaxValue)
      for (c <- 1 until k) {
        var farthest = 0; var farD = -1.0
        var s = 0
        while (s < sample.length) {
          var dist = 0.0; var t = 0
          val v = sample(s)
          while (t < dsub) {
            val diff = v(j * dsub + t) - cents(c - 1)(t); dist += diff * diff; t += 1
          }
          if (dist < minD(s)) minD(s) = dist
          if (minD(s) > farD) { farD = minD(s); farthest = s }
          s += 1
        }
        cents(c) = sub(farthest)
      }
      val assign = new Array[Int](sample.length)
      var it = 0
      while (it < iters) {
        var moved = false
        var s = 0
        while (s < sample.length) {
          val v = sample(s)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var dist = 0.0; var t = 0
            while (t < dsub) {
              val diff = v(j * dsub + t) - cents(c)(t); dist += diff * diff; t += 1
            }
            if (dist < bestD) { bestD = dist; best = c }
            c += 1
          }
          if (assign(s) != best) { assign(s) = best; moved = true }
          s += 1
        }
        if (!moved && it > 0) it = iters
        else {
          val sums = Array.fill(k)(new Array[Double](dsub))
          val counts = new Array[Int](k)
          var s2 = 0
          while (s2 < sample.length) {
            val v = sample(s2); val a = assign(s2)
            counts(a) += 1
            var t = 0
            while (t < dsub) { sums(a)(t) += v(j * dsub + t); t += 1 }
            s2 += 1
          }
          var c2 = 0
          while (c2 < k) {
            if (counts(c2) > 0) {
              var t = 0
              while (t < dsub) { cents(c2)(t) = sums(c2)(t) / counts(c2); t += 1 }
            } // empty cluster: keep the previous centroid
            c2 += 1
          }
          it += 1
        }
      }
      // fill the fixed ksub-wide layout; unused slots repeat the last
      // centroid so a stray code can never index out of range
      for (c <- 0 until ksub) {
        val src = cents(math.min(c, k - 1))
        System.arraycopy(src, 0, flat, (j * ksub + c) * dsub, dsub)
      }
    }
    flat
  }

  /** Memoized IVF-PQ index: the coarse cells come from [[ivfIndex]] (same
    * plan-keyed cache) and each cell row is re-stored as its m-byte PQ
    * code ONLY — the float vectors are dropped, which is the point: the
    * probe scan reads `m` bytes per corpus row instead of 4·d, turning a
    * bandwidth-bound ANN sweep into one that fits page cache at 100 TB.
    * Returns (centroids, flat codebook, cells-with-codes). */
  private val pqCache = scala.collection.mutable.LinkedHashMap
    .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Int, Int, Int),
           (Array[Array[Double]], Array[Double], DataFrame)]
  private val MaxPqEntries = 8

  def ivfPqIndex(corpus: DataFrame, corpusId: String, corpusVec: String,
                 nlist: Int, m: Int, ksub: Int)
      : (Array[Array[Double]], Array[Double], DataFrame) = synchronized {
    val key = (corpus.queryExecution.optimizedPlan.canonicalized,
      s"$corpusId/$corpusVec", nlist, m, ksub)
    pqCache.get(key) match {
      case Some(v) => v
      case None =>
        val (centroids, cells) = ivfIndex(corpus, corpusId, corpusVec, nlist)
        val cb = pqTrain(corpus.select(col(corpusVec)), corpusVec, m, ksub)
        val coded = cells
          .select(col("cell"), col("neighbor_id"),
            graft.functions.PqKernel.encode(col("cv"), lit(cb), lit(m)).as("code"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val entry = (centroids, cb, coded)
        pqCache.put(key, entry)
        while (pqCache.size > MaxPqEntries) {
          val (oldKey, (_, _, old)) = pqCache.head
          old.unpersist()
          pqCache.remove(oldKey)
        }
        entry
    }
  }

  /** IVF-PQ ANN with optional exact re-rank: probe `nprobe` coarse cells,
    * score candidates with the asymmetric PQ cosine (codes only — no
    * float corpus reads), and when `refine > k` re-rank the PQ top-
    * `refine` against the exact float vectors (a semi-join back to the
    * corpus on ids — the standard retrieve-then-rerank shape; the exact
    * pass touches `refine` rows per query, not the corpus). */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame,
                queryId: String, queryVec: String,
                corpusId: String, corpusVec: String,
                k: Int, nlist: Int, nprobe: Int,
                m: Int, ksub: Int = 256, refine: Int = 0): DataFrame = {
    val (centroids, cb, coded) = ivfPqIndex(corpus, corpusId, corpusVec, nlist, m, ksub)
    val cellDist = centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - dot(col("qv"), array(c.map(lit(_)): _*)) * 2d).as("d"),
             lit(i).as("cell"))
    }
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .withColumn("cell",
        explode(transform(slice(array_sort(array(cellDist: _*)), 1, nprobe),
          s => s.getField("cell"))))
    val scored = coded.join(broadcast(q), Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.PqKernel.cosine(col("qv"), col("code"), lit(cb)).as("cos"))
    if (refine <= k) topKByScore(scored, k)
    else {
      val shortlist = topKByScore(scored, refine).select("query_id", "neighbor_id")
      val qv = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      val cv = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
      val exact = shortlist
        .join(cv, Seq("neighbor_id"))
        .join(broadcast(qv), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine(col("qv"), col("cv")).as("cos"))
      topKByScore(exact, k)
    }
  }
}
