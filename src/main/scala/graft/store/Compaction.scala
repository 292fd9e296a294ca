package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Store lifecycle jobs — the Spark-layout analogue of the reference's
  * background mergers and retention enforcement (datadb.go:210-259 merges
  * small parts; storage.go:42-52 drops whole expired day partitions).
  *
  * Streaming `appendBatch` accretes one small parquet file per micro-batch
  * per (tenant, day) partition and appends per-batch-deduped stream rows,
  * so both `logs` and `streams` need periodic rewriting:
  *
  *   - [[optimize]] merges each over-fragmented (tenant,_day) partition
  *     into ~target-sized files (restoring the (_stream_id,_time) sort, so
  *     row-group min/max pruning keeps working) and rewrites `streams`
  *     globally deduplicated. Partition-selective: untouched partitions
  *     are never read or rewritten — at 100 TB only the hot (recent) day
  *     directories churn, so each run reads a few GiB, not the table.
  *   - [[enforceRetention]] removes whole `_day=` directories older than
  *     the retention window — a pure directory delete, no data rewrite,
  *     exactly like the reference's per-day partition drops — and then
  *     prunes `streams` rows whose stream no longer exists anywhere in the
  *     store (the reference drops indexdb alongside its partition,
  *     storage.go:42-52; without this, ids of wholly-expired streams live
  *     in the stream index forever).
  *
  * All directory walking / renaming / deleting goes through the Hadoop
  * FileSystem API ([[Fs]]), so these jobs run against `hdfs://` and
  * `s3a://` stores, not just local disk.
  *
  * Crash-safety note: new files land (with globally unique part names)
  * before the old ones are deleted, so a crash mid-swap leaves duplicate
  * rows rather than lost rows; re-running optimize converges. A
  * transactional table format would close even that window — out of scope
  * for the plain-parquet layout.
  */
object Compaction {

  /** Merge small files in each (tenant,_day) partition of `dir` and rewrite
    * `<dir>/streams` deduplicated. Partitions with fewer than
    * `minFilesToCompact` files are left untouched. */
  def optimize(spark: SparkSession, dir: String,
               targetFileBytes: Long = 256L << 20,
               minFilesToCompact: Int = 2,
               dayPrefix: Option[String] = None,
               skipAtTargetSize: Boolean = false): Unit =
      StoreLocks.compaction(dir).synchronized {
    val promoted = LogStore.promotedFields(dir).map(_._1)
    // /internal/force_merge?partition_prefix=YYYYMMDD scopes the merge to
    // matching day partitions (vlstorage/main.go:230); both 20240921 and
    // 2024-09-21 spellings accepted
    val prefix = dayPrefix.map(_.replace("-", ""))
    val candidates = partitionDirs(dir).flatMap { pdir =>
      val dayOk = prefix.forall(p =>
        pdir.getName.stripPrefix("_day=").replace("-", "").startsWith(p))
      val files = dataFiles(pdir)
      // post-bulk-load merges (skipAtTargetSize) only touch genuinely
      // fragmented partitions: files already near target size would be
      // rewritten 1:1 — pure I/O churn. force_merge keeps merging
      // unconditionally, like the reference's forced final merge.
      def small = !skipAtTargetSize ||
        files.map(_.getLen).sum / files.length < targetFileBytes / 2
      if (dayOk && files.length >= minFilesToCompact && small)
        Some((pdir, files))
      else None
    }
    // a small part's rewrite + stats jobs are one-or-few-task jobs (one
    // split per file), so compacting partitions SEQUENTIALLY idles the
    // rest of the cluster — run a bounded worker pool over partitions,
    // like the reference's background mergers (datadb.go bgMergers).
    // Partitions are independent (distinct dirs, UUID tmp names); the
    // sidecar writes inside compactPartition serialize on the store
    // append lock as before. Measured: 30-day 5M-row build's compact
    // phase 199s → 46s.
    val par = math.max(1, math.min(8,
      spark.sparkContext.defaultParallelism / 4))
    if (candidates.sizeIs <= 1 || par == 1)
      candidates.foreach { case (p, fs) =>
        compactPartition(spark, p, fs, targetFileBytes, promoted) }
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
      try
        candidates.map { case (p, fs) =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit =
              compactPartition(spark, p, fs, targetFileBytes, promoted)
          })
        }.foreach(_.get())
      finally pool.shutdown()
    }
    dedupStreams(spark, dir)
    // the sidecar is maintained INCREMENTALLY across the rewrite: rows for
    // replaced files drop out via candidateFiles' reconciliation (and the
    // refresh's prune), merged output files get bloomed from their own
    // (much smaller) data — never a full-store rebuild, which at 100 TB
    // would be a second copy of the compaction itself
    LogStore.invalidateCaches(dir)
    try MsgBloom.refresh(spark, dir)
    catch { case e: Exception =>
      // refresh is an optimization; on any failure fall back to scan-all
      System.err.println(s"[optimize] bloom refresh failed: ${e.getMessage}")
      MsgBloom.invalidate(dir)
    }
    try FieldBloom.refresh(spark, dir)
    catch { case e: Exception =>
      System.err.println(s"[optimize] field-bloom refresh failed: ${e.getMessage}")
      FieldBloom.invalidate(dir)
    }
    LogStore.invalidateCaches(dir)
  }

  /** Rewrite EVERY partition so promoted fields become physical columns in
    * every file, then mark the manifest `done` — after this, reads are
    * plain column references (the mixed-backlog coalesce disappears and
    * filters on the promoted field push down to the parquet scan). One
    * deliberate full rewrite, like a reference forced-merge. */
  def materializePromotion(spark: SparkSession, dir: String,
                           targetFileBytes: Long = 256L << 20): Unit =
      StoreLocks.compaction(dir).synchronized {
    val promoted = LogStore.promotedFields(dir).map(_._1)
    if (promoted.nonEmpty) {
      partitionDirs(dir).foreach { pdir =>
        val files = dataFiles(pdir)
        if (files.nonEmpty)
          compactPartition(spark, pdir, files, targetFileBytes, promoted)
      }
      LogStore.markPromotionDone(dir)
      // every file's promoted column is now physically a string
      // (applyPromotion's cast) — the manifest must follow, or the
      // explicit-schema read keeps requesting the old numeric type and
      // throws PARQUET_COLUMN_DATA_TYPE_MISMATCH (ADVICE r14)
      LogStore.overrideManifestStringTypes(dir, promoted)
      MsgBloom.invalidate(dir)
      // promotion changes the store schema, so the covered-field list is
      // stale too — drop rather than refresh
      FieldBloom.invalidate(dir)
      LogStore.invalidateCaches(dir)
    }
  }

  /** Background store maintenance, mirroring the reference's continuously
    * running merge workers + per-partition retention watcher
    * (lib/logstorage/datadb.go bgMergers; storage.go:42-52 retention).
    * Every `intervalMs` a daemon thread compacts any (tenant,_day)
    * partition that accumulated `minFilesToCompact`+ small files (ingest
    * micro-batches create many), consolidates the append-mode `streams`
    * table once it fragments past `maxStreamsFiles`, and — when
    * `retentionDays` is set — drops expired days. Errors are logged and
    * the loop keeps running; close() stops it. */
  def startBackground(spark: SparkSession, dir: String,
                      intervalMs: Long = 60000L,
                      retentionDays: Option[Int] = None,
                      targetFileBytes: Long = 256L << 20,
                      minFilesToCompact: Int = 8,
                      maxStreamsFiles: Int = 16): AutoCloseable = {
    @volatile var closed = false
    def tick(): Unit = StoreLocks.compaction(dir).synchronized {
      val promoted = LogStore.promotedFields(dir).map(_._1)
      val compacted = partitionDirs(dir).count { pdir =>
        val files = dataFiles(pdir)
        val doIt = files.length >= minFilesToCompact
        if (doIt) {
          compactPartition(spark, pdir, files, targetFileBytes, promoted)
          // shrink the stale-relation window: a query planned against the
          // pre-swap file list and executed after it fails with
          // FILE_NOT_EXIST and must retry (the reference refcounts parts
          // instead; Spark's immutable-file model makes retry the contract)
          LogStore.invalidateCaches(dir)
        }
        doIt
      }
      val streamsFrag =
        try Fs.list(s"$dir/streams").count(_.getPath.getName.endsWith(".parquet"))
        catch { case _: Exception => 0 }
      if (compacted > 0) {
        graft.server.Metrics.compactions.addAndGet(compacted.toLong)
        dedupStreams(spark, dir)
        LogStore.invalidateCaches(dir)
      } else if (streamsFrag > maxStreamsFiles) {
        dedupStreams(spark, dir)
        LogStore.invalidateCaches(dir)
      }
      retentionDays.foreach { d =>
        val dropped = enforceRetention(spark, dir, d)
        graft.server.Metrics.retentionDaysDropped.addAndGet(dropped.size.toLong)
      }
      // incremental bloom maintenance every tick: blooms new flush /
      // compaction-output files and prunes rows for deleted ones; no-op
      // when there is no sidecar or nothing changed
      try {
        val (added, pruned) = MsgBloom.refresh(spark, dir)
        if (added > 0 || pruned > 0)
          graft.server.Metrics.bloomFilesRefreshed.addAndGet(added.toLong)
      } catch { case e: Throwable =>
        System.err.println(s"[lifecycle] bloom refresh failed: ${e.getMessage}")
      }
      try {
        val (added, _) = FieldBloom.refresh(spark, dir)
        if (added > 0)
          graft.server.Metrics.bloomFilesRefreshed.addAndGet(added.toLong)
      } catch { case e: Throwable =>
        System.err.println(s"[lifecycle] field-bloom refresh failed: ${e.getMessage}")
      }
    }
    val t = new Thread(() => {
      // ±20% jitter so a fleet of nodes started together doesn't compact
      // in lockstep (the reference staggers its bgMergers the same way);
      // ticks run sequentially on this one thread, which is the
      // single-flight guard — a slow compaction delays the next tick
      // instead of overlapping it
      val rnd = new scala.util.Random()
      while (!closed) {
        val jittered = (intervalMs * (0.8 + 0.4 * rnd.nextDouble())).toLong
        try Thread.sleep(jittered) catch { case _: InterruptedException => }
        if (!closed) {
          try tick()
          catch { case e: Throwable =>
            System.err.println(s"[lifecycle] tick failed: ${e.getMessage}") }
        }
      }
    }, "graft-lifecycle")
    t.setDaemon(true)
    t.start()
    () => { closed = true; t.interrupt() }
  }

  /** Drop `_day=` partitions strictly older than `retentionDays` (whole-day
    * granularity, storage.go:42-52), then prune dead ids out of `streams`.
    * `today` is overridable for tests. */
  def enforceRetention(spark: SparkSession, dir: String, retentionDays: Int,
                       today: java.time.LocalDate =
                         java.time.LocalDate.now(java.time.ZoneOffset.UTC)): Seq[String] =
      StoreLocks.compaction(dir).synchronized {
    val cutoff = today.minusDays(retentionDays.toLong)
    val droppedParts = Set.newBuilder[String]
    val dropped = partitionDirs(dir).flatMap { pdir =>
      val day = pdir.getName.stripPrefix("_day=")
      val d = try java.time.LocalDate.parse(day) catch { case _: Exception => null }
      if (d != null && d.isBefore(cutoff)) {
        import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName
        droppedParts += s"${unescapePathName(pdir.getParent.getName)}/" +
          unescapePathName(pdir.getName)
        Fs.delete(pdir.toString)
        Some(day)
      } else None
    }.distinct.sorted
    if (dropped.nonEmpty) {
      MsgBloom.invalidate(dir)
      FieldBloom.invalidate(dir)
      // sidecar hygiene: the serving paths never admit an off-disk part
      // (coverage checks), so this is about dead keys not accumulating —
      // and the retention soak asserts they actually go away. Under the
      // append lock: sidecar writers serialize there.
      StoreLocks.logsAppend(dir).synchronized {
        FieldNameMeta.dropParts(dir, droppedParts.result())
        ValueTypeMeta.dropParts(dir, droppedParts.result())
      }
      // invalidate BEFORE the streams prune: the memoized logs relation
      // still indexes the files just deleted
      LogStore.invalidateCaches(dir)
      pruneStreams(spark, dir)
      LogStore.invalidateCaches(dir)
    }
    dropped
  }

  // ------------------------------------------------------------ internals

  /** All `_day=` leaf partition dirs under `<dir>/logs/tenant=<t>/`. */
  private def partitionDirs(dir: String): Seq[Path] =
    Fs.list(s"$dir/logs")
      .filter(t => t.isDirectory && t.getPath.getName.startsWith("tenant="))
      .flatMap(t => Fs.list(t.getPath.toString))
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("_day="))
      .map(_.getPath)

  private def dataFiles(pdir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
    Fs.list(pdir.toString).filter { f =>
      val n = f.getPath.getName
      f.isFile && n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
    }

  /** Rewrite one partition's files as ~targetFileBytes-sized sorted files.
    * The partition columns live in the directory name, not the rows, so
    * reading the bare files and writing back into the same directory keeps
    * the layout intact. Promoted fields materialize as physical columns in
    * the rewrite (block re-encoding is where the reference applies layout
    * changes too). */
  private def compactPartition(spark: SparkSession, pdir: Path,
                               files: Seq[org.apache.hadoop.fs.FileStatus],
                               targetFileBytes: Long,
                               promoted: Seq[String] = Nil): Unit = {
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(pdir, s".compact_tmp_${java.util.UUID.randomUUID()}")
    val paths = files.map(_.getPath.toString)
    // mergeSchema, not one-footer inference: a partition can mix bulk
    // files (physical batch columns, no `fields` map) with protocol
    // appends (fixed columns + map) — inference from a sampled footer
    // would REWRITE the partition without the other shape's columns,
    // permanently deleting that data. The footer sweep is bounded by the
    // files being compacted (which are about to be fully read anyway).
    val raw = spark.read.option("mergeSchema", "true").parquet(paths: _*)
    val df =
      if (promoted.isEmpty) raw
      else {
        // promotion can additionally span pre-/post-promotion files whose
        // union mergeSchema already built; just ensure the column exists
        val schema = promoted.foldLeft(raw.schema)((sch, k) =>
          if (sch.fieldNames.contains(k)) sch
          else sch.add(k, org.apache.spark.sql.types.StringType))
        LogStore.applyPromotion(
          spark.read.schema(schema).parquet(paths: _*), promoted)
      }
    val __t0 = System.nanoTime()
    // row-group bloom filters for high-cardinality string columns ride
    // the rewrite (LogStore.bloomWriteOptions) — blooms are made at
    // merge time, like the reference's block headers
    val storeRoot = pdir.getParent.getParent.getParent.toString
    if (sys.env.contains("GRAFT_BLOOM_DEBUG"))
      System.err.println(s"[compact] storeRoot=$storeRoot opts=" +
        LogStore.bloomWriteOptions(storeRoot, df.schema))
    df
      .repartition(nOut, col("_stream_id"))
      .sortWithinPartitions(col("_stream_id"), col("_time"))
      .write.option("compression", LogStore.ParquetCodec)
      .option("parquet.block.size", LogStore.ParquetRowGroupBytes)
      .options(LogStore.bloomWriteOptions(storeRoot, df.schema))
      .parquet(tmp.toString)
    val __t1 = System.nanoTime()
    // exact whole-part value-type verdict, classified on the data being
    // rewritten BEFORE the source files are deleted (`df` still reads
    // them); the background merge is where the reference decides block
    // types too. The verdict is held back until the post-swap check below.
    val verdict: Option[(String, String, Map[String, String],
                         Map[String, Map[String, String]],
                         Map[String, FieldNameMeta.FieldStat])] =
      try {
        // partition dir names are Hadoop path-escaped ("tenant=0%3A0") —
        // decode so the key matches the raw-value keys the bulk path writes
        import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName
        val partKey = s"${unescapePathName(pdir.getParent.getName)}/" +
          unescapePathName(pdir.getName)
        val storeDir = pdir.getParent.getParent.getParent.toUri.getPath
        // ONE fused rollup over the freshly written tmp files yields the
        // per-file verdicts (names survive the move-in rename below, so
        // the keys stay valid after the swap — a parquet file is this
        // store's block, the reference's verdict granularity,
        // filter_value_type.go:67), the whole-part verdict, and the
        // field-name hit counts — the previous three separate passes
        // made compaction read every partition 4×
        val (partTypes, fileTypes, fieldHits) =
          ValueTypeMeta.compactionStats(spark.read.parquet(tmp.toString))
        if (sys.env.contains("GRAFT_COMPACT_DEBUG"))
          System.err.println(f"[compact] $pdir rewrite=${(__t1 - __t0) / 1e6}%.0fms " +
            f"stats=${(System.nanoTime() - __t1) / 1e6}%.0fms")
        Some((storeDir, partKey, partTypes, fileTypes, fieldHits))
      } catch { case e: Exception =>
        // metadata is an optimization; on failure value_type falls back to
        // the scan classification
        System.err.println(s"[compact] value-type classify failed: ${e.getMessage}")
        None
      }
    val newFiles = dataFiles(tmp)
    // unique part names: move-in before delete-old, so a crash leaves
    // duplicates (re-converged by the next run), never data loss
    newFiles.foreach { f =>
      Fs.rename(f.getPath.toString,
        new Path(pdir, f.getPath.getName).toString)
    }
    files.foreach(f => Fs.delete(f.getPath.toString))
    Fs.delete(tmp.toString)
    // record the verdict ONLY if the part still holds exactly the files
    // this pass wrote: an append that landed mid-compaction added a file
    // the classification never saw, and a stale whole-part verdict would
    // be a wrong answer, not a missed optimization. Serialized against
    // appends (their invalidate runs under the same per-dir append lock),
    // so the check can't race a concurrent flush's sidecar write.
    verdict.foreach { case (storeDir, partKey, fieldTypes, fileTypes, fieldHits) =>
      StoreLocks.logsAppend(storeDir).synchronized {
        val now = dataFiles(pdir).map(_.getPath.getName).toSet
        val written = newFiles.map(_.getPath.getName).toSet
        if (now == written) {
          if (fieldTypes.nonEmpty)
            ValueTypeMeta.recordPart(storeDir, partKey, fieldTypes,
              fileTypes.view.filterKeys(written).toMap)
          if (fieldHits.nonEmpty)
            FieldNameMeta.record(storeDir, Map(partKey -> fieldHits),
              overwrite = false)
        }
      }
    }
  }

  /** Output file count for a streams rewrite, sized from the input bytes —
    * a fixed coalesce(1) would funnel a tens-of-millions-of-streams table
    * through one writer task. */
  private def streamsOutFiles(dir: String, targetFileBytes: Long = 64L << 20): Int = {
    val bytes = Fs.list(s"$dir/streams")
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
  }

  /** Rewrite `<dir>/streams` with one row per `_stream_id` (appendBatch
    * dedups only within its own batch — Ingest.scala — so the table
    * accumulates duplicates across batches; one indexdb entry per stream
    * is the invariant: indexdb.go:182). */
  private def dedupStreams(spark: SparkSession, dir: String): Unit = {
    if (!Fs.exists(s"$dir/streams")) return
    swapStreams(spark, dir)(
      spark.read.parquet(s"$dir/streams").dropDuplicates("_stream_id"))
  }

  /** Drop `streams` rows whose `_stream_id` no longer appears anywhere in
    * the remaining log data. Runs after retention deletes day partitions;
    * the semi-join scans only the `_stream_id` column of the surviving
    * days (a cheap columnar read, and retention runs rarely). */
  private def pruneStreams(spark: SparkSession, dir: String): Unit = {
    if (!Fs.exists(s"$dir/streams")) return
    // reset the ingest path's known-streams set BEFORE taking the prune
    // snapshot: rows are about to be removed, and a flush racing this
    // prune must re-register its streams rather than trust the set. A
    // flush that already skipped registration on the old set has its logs
    // rows visible to the semi-join below, so its streams rows survive.
    // (dedupStreams needs no reset — it only collapses duplicates.)
    graft.streaming.Ingest.forgetKnownStreams(dir)
    swapStreams(spark, dir) {
      val cur = spark.read.parquet(s"$dir/streams")
      if (partitionDirs(dir).isEmpty) cur.limit(0) // whole store expired
      else cur.join(
        LogStore.read(spark, dir).select("_stream_id").distinct(),
        Seq("_stream_id"), "left_semi")
    }
  }

  /** tmp-write → atomic-swap rewrite of `<dir>/streams`. The snapshot df
    * is BUILT inside the store's streams lock (by-name parameter):
    * `spark.read.parquet` takes its file-listing snapshot eagerly at
    * construction, so a df built before lock acquisition misses any
    * append that commits in the gap and the rename then wipes those rows
    * — a permanently lost stream, because the appender's known-streams
    * set says it is registered and no future flush re-registers it
    * (caught intermittently by RetentionSoakSpec: a mid-soak retention
    * whose committed days had all expired swapped in an empty table over
    * concurrent re-registrations). Appenders hold the same lock
    * (Ingest.appendBatch streams upsert), so inside the lock the listing
    * is complete and stays complete until the swap lands. */
  private def swapStreams(spark: SparkSession, dir: String)(
      mkDf: => org.apache.spark.sql.DataFrame): Unit =
    StoreLocks.streams(dir).synchronized {
      val df = mkDf
      val cur = s"$dir/streams"
      val tmp = s"$dir/.streams_tmp_${java.util.UUID.randomUUID()}"
      df.coalesce(streamsOutFiles(dir)).write
        .option("compression", LogStore.ParquetCodec).parquet(tmp)
      val old = s"$dir/.streams_old_${java.util.UUID.randomUUID()}"
      Fs.rename(cur, old)
      Fs.rename(tmp, cur)
      Fs.delete(old)
    }
}
