package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  // memoized per (session, path): reusing one DataFrame instance lets
  // Spark reuse its InMemoryFileIndex + schema across queries instead of
  // re-listing and re-reading footers per query (metastore-like behavior)
  private val cache =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  /** The driver parquet files are single-row-group, which pins every scan
    * to ONE thread no matter how many cores/executors exist (Spark splits
    * files by byte range, but only the split containing the row-group
    * start does work). A real deployment never queries raw client files —
    * data is ingested into the engine's own multi-part layout first (the
    * reference's parts, datadb.go; our LogStore does the same for the log
    * store). This materializes each table once into a multi-file copy so
    * table scans parallelize; idempotent per (sf, table), marker-guarded.
    */
  private def parallelized(spark: SparkSession, sfDir: String,
                           name: String): String = synchronized {
    val src = s"$sfDir/$name.parquet"
    val sf = new org.apache.hadoop.fs.Path(sfDir).getName
    // v2: split cap 32 → 16 — the layout version is IN the path because
    // the _src_sig guard only covers the source file, so a policy change
    // would otherwise be inert on any checkout with a warm v1 rewrite
    val dir = s"/root/repo/target/graft_tbl/v2/$sf/$name"
    // the copy is keyed by the SOURCE's identity+content signature, not
    // just the sf basename: two corpora with the same basename, or a
    // regenerated fixture, must not be served a stale rewrite
    val srcFile = new java.io.File(src)
    val sig = s"${srcFile.getAbsolutePath}|${srcFile.length()}|${srcFile.lastModified()}"
    val sigFile = new java.io.File(s"$dir/_src_sig")
    val sigOk = sigFile.exists() &&
      new String(java.nio.file.Files.readAllBytes(sigFile.toPath), "UTF-8") == sig
    if (!new java.io.File(s"$dir/_SUCCESS").exists() || !sigOk) {
      val raw = spark.read.parquet(src)
      // split by ROW count, not bytes: these tables are small compressed
      // but carry heavy per-row downstream work (shingling, minhash,
      // vector math), all of which runs on the scan stage — with one
      // input partition that work is single-threaded regardless of cores.
      // Tiny tables stay one file (they broadcast anyway).
      val rows = raw.count() // metadata-only on parquet
      // ~6k rows per split (cap 16): big tables decode on many cores;
      // small ones stay single-file — their multi-stage consumers (LSH
      // joins, iterative CC) pay per-task scheduling on every stage, which
      // outweighs scan parallelism below a few thousand rows per task.
      // Cap measured at 16, not 32: with 32 concurrent scan tasks the
      // per-task parquet open/decode overhead contends (lineitem
      // filter+agg wall 0.22s at 32 files vs 0.16s at 4/8/16), and no
      // query here decodes enough bytes per row to need more than 16
      // parallel decoders at these SFs.
      val splits = math.max(1L, math.min(16L, rows / 6000L)).toInt
      raw.repartition(splits).write.mode("overwrite").parquet(dir)
      java.nio.file.Files.write(sigFile.toPath, sig.getBytes("UTF-8"))
    }
    dir
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    synchronized {
      cache.getOrElseUpdate((spark, s"$sfDir/$name.parquet"), {
        val dir = parallelized(spark, sfDir, name)
        spark.read.parquet(dir)
      })
    }

  /** The original driver file, un-rewritten — for the `blocks_count` /
    * `block_stats` entries whose oracles pin the raw file count. */
  def loadRaw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    synchronized {
      cache.getOrElseUpdate((spark, s"raw:$sfDir/$name.parquet"),
        spark.read.parquet(s"$sfDir/$name.parquet"))
    }

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame   = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame     = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame   = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame   = load(spark, d, "region")
  def documents(spark: SparkSession, d: String): DataFrame  = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** Normalize `events.ts` to (ts: TimestampType, ts_ns: LongType) no
    * matter which physical encoding the fixture generator emitted. The
    * reference never assumes a wire type — values are ingested as strings
    * and typed per block (lib/logstorage/values_encoder.go:109-154) — so
    * the loader must accept every encoding the generator has produced:
    *   - parquet TIMESTAMP(NANOS): Spark 4 refuses it as a timestamp;
    *     with `nanosAsLong` it loads as LongType nanos-since-epoch. Derive
    *     `ts` by integer division (the raw int64 exceeds 2^53 — double
    *     arithmetic would corrupt it) and keep the nanos as `ts_ns`.
    *   - parquet timestamp[us] (tz'd or NTZ): loads as (NTZ)Timestamp.
    *     Keep the instant as `ts` (cast to TimestampType — a no-op under
    *     the UTC session timezone every entrypoint pins) and derive
    *     `ts_ns = unix_micros(ts) * 1000`.
    */
  private def deriveTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType | TimestampNTZType =>
        val tsUtc = col("ts").cast(TimestampType)
        df.withColumn("ts_ns", unix_micros(tsUtc) * lit(1000L))
          .withColumn("ts", tsUtc)
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other " +
            s"(expected int64 nanos, timestamp[us], or timestamp[ns]); " +
            s"full schema: ${df.schema.treeString}")
    }
  }

  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    deriveTs(load(spark, d, "events"))
  }

  private def eventsRaw(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    deriveTs(loadRaw(spark, d, "events"))
  }

  /** `events` mapped into the engine's log-event shape (FIXTURES.md §1):
    * `_time` + `_msg` + promoted typed field columns. LogsQL queries run
    * directly against this view. */
  def eventsLog(spark: SparkSession, d: String): DataFrame =
    events(spark, d).select(
      col("ts").as("_time"),
      col("props").as("_msg"),
      col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** eventsLog over the raw single driver file (blocks oracles pin its
    * file count). */
  def eventsLogRaw(spark: SparkSession, d: String): DataFrame =
    eventsRaw(spark, d).select(
      col("ts").as("_time"),
      col("props").as("_msg"),
      col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** `documents` as a log view: `_msg` = text. */
  def docsLog(spark: SparkSession, d: String): DataFrame =
    documents(spark, d).select(
      col("text").as("_msg"),
      col("doc_id"), col("lang"), col("source"), col("n_chars"))
}
