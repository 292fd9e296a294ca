package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Hadoop-FileSystem access for the store lifecycle jobs. Everything that
  * walks, renames, or deletes store files goes through this layer, so
  * optimize / retention / lastN day-listing / bloom sidecars run unchanged
  * against `file://`, `hdfs://` and `s3a://` stores — `java.io.File` walks
  * would silently restrict the whole lifecycle to local disk, which is not
  * where a 100 TB store lives.
  *
  * Uses the active session's Hadoop conf when one exists (so `s3a://`
  * credentials / endpoint settings configured on the SparkSession apply),
  * falling back to a plain Configuration for session-less callers.
  */
private[graft] object Fs {

  private def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  def of(p: String): FileSystem = new Path(p).getFileSystem(conf)

  /** Children of `p`, empty when `p` doesn't exist. */
  def list(p: String): Seq[FileStatus] = {
    val fs = of(p)
    val path = new Path(p)
    if (!fs.exists(path)) Nil else fs.listStatus(path).toSeq
  }

  def exists(p: String): Boolean = of(p).exists(new Path(p))

  /** Recursive delete; false when `p` didn't exist. */
  def delete(p: String): Boolean = {
    val fs = of(p)
    val path = new Path(p)
    fs.exists(path) && fs.delete(path, true)
  }

  /** Rename within one filesystem (atomic on HDFS/local; S3A emulates). */
  def rename(src: String, dst: String): Boolean =
    of(src).rename(new Path(src), new Path(dst))

  /** Rename REPLACING an existing `dst` in one atomic step where the
    * filesystem supports it (FileContext rename w/ OVERWRITE — POSIX
    * rename on local, atomic on HDFS). The plain FileSystem.rename
    * refuses an existing destination, which forced a delete-then-rename
    * window where concurrent readers saw NO file at all (ADVICE r13 on
    * the schema manifest). Falls back to delete+rename on filesystems
    * without FileContext support (e.g. raw S3A). */
  def renameOver(src: String, dst: String): Unit =
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        new Path(src).toUri, conf)
      fc.rename(new Path(src), new Path(dst),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      // src still present = the atomic swap did not happen; fall back to
      // the non-atomic window rather than failing the write
      case e: Exception if of(src).exists(new Path(src)) =>
        delete(dst)
        if (!rename(src, dst)) throw e
    }

  def readAll(p: String): Array[Byte] = {
    val in = of(p).open(new Path(p))
    try in.readAllBytes() finally in.close()
  }

  def writeAll(p: String, bytes: Array[Byte]): Unit = {
    val out = of(p).create(new Path(p), true)
    try out.write(bytes) finally out.close()
  }
}

/** Per-store coordination locks. All writes flow through the one driver
  * JVM (the reference is likewise a single-writer storage), so a JVM lock
  * is the correct scope; a multi-driver deployment would need an external
  * coordinator. The `streams` table is the only shared-REWRITE point:
  * ingest appends rows to it while lifecycle dedup/prune snapshot-read and
  * swap the whole directory — unserialized, an append landing between the
  * snapshot and the swap is silently deleted (and the two writers clash on
  * the directory's _temporary). Log data files never need this: appends
  * only create new files and compaction only touches files it listed. */
object StoreLocks {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def streams(dir: String): Object =
    locks.computeIfAbsent(dir.stripSuffix("/"), _ => new Object)

  /** Serializes `<dir>/logs` APPEND jobs: Spark's FileOutputCommitter
    * stages every concurrent append of one path under the same
    * `_temporary/0`, and whichever job commits first recursively deletes
    * it — nuking the other job's staged task output (TASK_WRITE_FAILED +
    * partially-duplicated rows, reproduced by IngestSoakProbe running the
    * jsonline group-committer and the syslog flusher together). Compaction
    * is unaffected (it writes to a private tmp dir and renames). */
  private val logLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def logsAppend(dir: String): Object =
    logLocks.computeIfAbsent(dir.stripSuffix("/"), _ => new Object)

  /** Serializes whole compaction passes per store: the background tick,
    * a one-shot optimize, /internal/force_merge, and retention all
    * rewrite-and-swap the same partitions and the streams table — two
    * passes racing can both claim the same source files (duplicate
    * merged output + failed deletes) and a swap between one pass's
    * plan-build and scan fails it with FILE_NOT_EXIST (reproduced by
    * IngestSoakProbe running optimize beside the background compactor). */
  private val compactionLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def compaction(dir: String): Object =
    compactionLocks.computeIfAbsent(dir.stripSuffix("/"), _ => new Object)
}
