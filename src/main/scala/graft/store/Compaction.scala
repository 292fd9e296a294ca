package graft.store

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

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
  *     exactly like the reference's per-day partition drops.
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
               minFilesToCompact: Int = 2): Unit = {
    partitionDirs(dir).foreach { pdir =>
      val files = dataFiles(pdir)
      if (files.length >= minFilesToCompact) compactPartition(spark, pdir, files, targetFileBytes)
    }
    dedupStreams(spark, dir)
    // the bloom sidecar now references replaced files; drop it so the next
    // bloom-assisted query path rebuilds over the compacted layout
    MsgBloom.invalidate(dir)
    LogStore.invalidateCaches(dir)
  }

  /** Drop `_day=` partitions strictly older than `retentionDays` (whole-day
    * granularity, storage.go:42-52). `today` is overridable for tests. */
  def enforceRetention(spark: SparkSession, dir: String, retentionDays: Int,
                       today: java.time.LocalDate =
                         java.time.LocalDate.now(java.time.ZoneOffset.UTC)): Seq[String] = {
    val cutoff = today.minusDays(retentionDays.toLong)
    val dropped = partitionDirs(dir).flatMap { pdir =>
      val day = pdir.getName.stripPrefix("_day=")
      val d = try java.time.LocalDate.parse(day) catch { case _: Exception => null }
      if (d != null && d.isBefore(cutoff)) {
        deleteRecursively(pdir)
        Some(day)
      } else None
    }.distinct.sorted
    if (dropped.nonEmpty) {
      MsgBloom.invalidate(dir)
      LogStore.invalidateCaches(dir)
    }
    dropped
  }

  // ------------------------------------------------------------ internals

  /** All `_day=` leaf partition dirs under `<dir>/logs/tenant=<t>/`. */
  private def partitionDirs(dir: String): Seq[File] = {
    val root = new File(s"$dir/logs")
    Option(root.listFiles()).getOrElse(Array.empty).toSeq
      .filter(t => t.isDirectory && t.getName.startsWith("tenant="))
      .flatMap(t => Option(t.listFiles()).getOrElse(Array.empty).toSeq)
      .filter(d => d.isDirectory && d.getName.startsWith("_day="))
  }

  private def dataFiles(pdir: File): Array[File] =
    Option(pdir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith(".") && !f.getName.startsWith("_"))

  /** Rewrite one partition's files as ~targetFileBytes-sized sorted files.
    * The partition columns live in the directory name, not the rows, so
    * reading the bare files and writing back into the same directory keeps
    * the layout intact. */
  private def compactPartition(spark: SparkSession, pdir: File,
                               files: Array[File], targetFileBytes: Long): Unit = {
    val bytes = files.map(_.length).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new File(pdir, s".compact_tmp_${java.util.UUID.randomUUID()}")
    spark.read.parquet(files.map(_.getPath).toSeq: _*)
      .repartition(nOut, col("_stream_id"))
      .sortWithinPartitions(col("_stream_id"), col("_time"))
      .write.parquet(tmp.getPath)
    val newFiles = dataFiles(tmp)
    // unique part names: move-in before delete-old, so a crash leaves
    // duplicates (re-converged by the next run), never data loss
    newFiles.foreach { f =>
      Files.move(f.toPath, Paths.get(pdir.getPath, f.getName),
        StandardCopyOption.ATOMIC_MOVE)
    }
    files.foreach(_.delete())
    deleteRecursively(tmp)
  }

  /** Rewrite `<dir>/streams` with one row per `_stream_id` (appendBatch
    * dedups only within its own batch — Ingest.scala — so the table
    * accumulates duplicates across batches, one indexdb entry per stream
    * is the invariant: indexdb.go:182). */
  private def dedupStreams(spark: SparkSession, dir: String): Unit = {
    val cur = new File(s"$dir/streams")
    if (!cur.exists()) return
    val tmp = new File(s"$dir/.streams_tmp_${java.util.UUID.randomUUID()}")
    spark.read.parquet(cur.getPath)
      .dropDuplicates("_stream_id")
      .coalesce(1)
      .write.parquet(tmp.getPath)
    val old = new File(s"$dir/.streams_old_${java.util.UUID.randomUUID()}")
    Files.move(cur.toPath, old.toPath, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp.toPath, cur.toPath, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
