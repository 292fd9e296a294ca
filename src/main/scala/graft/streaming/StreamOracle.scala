package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic batch-bounded drives of the stateful streaming ops, so
  * they can carry DuckDB oracle entries like every batch operator.
  *
  * Determinism argument: the file source picks up every store file in
  * the FIRST micro-batch (no maxFilesPerTrigger), so (a) dedup with an
  * effectively-infinite watermark delay emits exactly the distinct key
  * set (no state GC, no arrival-order sensitivity in the aggregated
  * output), and (b) every session sees all of its rows before the
  * watermark first advances — a far-future sentinel row then advances
  * the watermark past every last_time+gap and flushes all sessions on
  * the following (empty) micro-batch. The sentinel's own session stays
  * open by construction and is filtered out.
  */
object StreamOracle {

  private val Sentinel = "zzz_sentinel"

  /** Session the drive runs on: state partitions sized from the input
    * directory's bytes (Sessions.streamStatePartitions — one state-store
    * instance per ~8 MiB, saturating to the root's shuffle width at
    * scale), AQE off. The memory-sink table is session-scoped, so the
    * result agg runs on the same child — one job over a tiny local
    * table instead of AQE stage machinery on the root. Results are
    * partition-count-independent: every output below is a per-key
    * aggregate / distinct-pair count, and a key's rows land in one
    * state partition regardless of how many there are. */
  private def driveSession(root: SparkSession, dir: String): SparkSession =
    graft.Sessions.streamingDrive(root,
      graft.Sessions.streamStatePartitions(root,
        // Hadoop FS resolution, not java.io.File: on HDFS/S3 the latter
        // reported 0 bytes and serialized the drive to one state partition
        graft.Sessions.pathInputBytes(root, dir)))
  private val built = scala.collection.mutable.Set[String]()
  // nanoTime in the name: a checkpoint dir surviving from an earlier JVM
  // would otherwise resume the old query and skip the files it already saw
  private val nameSeq = new java.util.concurrent.atomic.AtomicLong(
    System.nanoTime())

  /** Store built from a deterministic 1-in-5 slice of the events fixture
    * (`user_id % 5 = 0` — the oracle SQL applies the same predicate; the
    * full relation re-streams per drive and the bench drives each query
    * four times) plus one sentinel row dated far after the fixture's
    * time range (fixture: 2024-01; sentinel: 2025-01-01 — in the past of
    * wall-clock, so ingest's future-time bound never drops it). One
    * build per (sfDir, JVM). */
  def ensureStore(spark: SparkSession, sfDir: String): String = synchronized {
    val name = new org.apache.hadoop.fs.Path(sfDir).getName
    val dir = s"/root/repo/target/graft_stream_store/v2/$name"
    if (!built.contains(dir) &&
        !new java.io.File(s"$dir/logs/_SUCCESS").exists()) {
      val ev = graft.Tables.eventsLog(spark, sfDir)
        .filter(col("user_id") % 5 === 0)
      val sentinel = spark.range(1).select(ev.schema.fields.toSeq.map { f =>
        (f.name match {
          case "_time" => lit("2025-01-01 00:00:00").cast("timestamp")
          case "_msg" => lit("{}")
          case "event_type" => lit(Sentinel)
          case _ => lit(null)
        }).cast(f.dataType).as(f.name)
      }: _*)
      graft.store.LogStore.ingest(ev.unionByName(sentinel), dir,
        Seq("event_type"))
    }
    built += dir
    dir
  }

  /** Scratch base for drive checkpoints. RAM-backed when the host has one
    * (/dev/shm), falling back to java.io.tmpdir; override with
    * `spark.graft.streaming.driveCheckpointDir`. Durability argument: a
    * drive's checkpoint is EPHEMERAL BY CONSTRUCTION — nanoTime-named so
    * it is never resumed (see nameSeq above), paired with a non-durable
    * memory sink, and deleted right after the drive — so the WAL/offset
    * fsyncs a disk checkpoint pays (~130ms/drive measured: walCommit 36 +
    * commitOffsets 41 + offset write inside latestOffset) purchase
    * recovery for a query that can never be recovered. Production streams
    * (StatefulOps callers, Ingest.fileStream) take caller-owned checkpoint
    * locations and are untouched. */
  private def ckptBase(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.streaming.driveCheckpointDir")
      .getOrElse {
        val shm = new java.io.File("/dev/shm")
        (if (shm.isDirectory && shm.canWrite) new java.io.File(shm, "graft_drive_ckpt")
         else new java.io.File(sys.props("java.io.tmpdir"), "graft_drive_ckpt"))
          .getAbsolutePath
      }

  private def drain(df: DataFrame, qn: String, extraBatch: Boolean): DataFrame = {
    val spark = df.sparkSession
    val ckpt = s"${ckptBase(spark)}/$qn"
    val q = df.writeStream.format("memory").queryName(qn)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      // event-time timeouts fire on the micro-batch AFTER the watermark
      // advance — give the no-data batch a chance to run
      if (extraBatch) q.processAllAvailable()
    } finally {
      q.stop()
      // the memory-sink table is what the caller reads; the checkpoint is
      // dead weight the moment the query stops — reclaim the scratch
      try {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(ckpt)
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: Exception => () }
    }
    spark.table(qn)
  }

  /** dedupStream over (event_type, user_id) with no state GC in range →
    * output is exactly the distinct key pairs; aggregated per type it
    * equals `count(DISTINCT user_id) GROUP BY event_type`. */
  def dedupResult(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensureStore(spark, sfDir)
    val sess = driveSession(spark, dir)
    val qn = s"strm_dedup_${nameSeq.incrementAndGet()}"
    val out = drain(
      StatefulOps.dedupStream(sess, dir, "*", Seq("event_type", "user_id"),
        watermarkDelay = "36500 days")
        // project to the key columns before the sink: the result agg reads
        // nothing else, the memory sink stops materializing full rows on
        // the driver, and column pruning reaches the store scan (guide
        // §2.3 — move fewer bytes; the kept-row CONTENT beyond the key was
        // never part of this entry's output)
        .select("event_type", "user_id"),
      qn, extraBatch = false)
    out.filter(col("event_type") =!= Sentinel)
      .groupBy("event_type")
      .agg(count(lit(1)).as("uniq_users"))
      .orderBy("event_type")
  }

  /** Deterministic synthetic doc corpus with planted near-dups (every
    * 10th doc repeats its predecessor plus a short tail) for the
    * streaming near-dup drive; sf-independent, built once per JVM. */
  private def ensureDocs(spark: SparkSession): String = synchronized {
    val dir = "/root/repo/target/graft_stream_store/neardup_docs_v1"
    if (!built.contains(dir) &&
        !new java.io.File(s"$dir/_SUCCESS").exists()) {
      import spark.implicits._
      val vocab = (0 until 30).map(i => s"w$i")
      def text(i: Int): String =
        (0 until 25).map(j => vocab((i * 7 + j * j) % 30)).mkString(" ")
      val rows = (0 until 200).map { i =>
        (i.toLong, if (i % 10 == 0 && i > 0) text(i - 1) + " zz zz" else text(i))
      }
      rows.toDF("doc_id", "text").repartition(2)
        .write.mode("overwrite").parquet(dir)
    }
    built += dir
    dir
  }

  /** nearDupCandidates over the planted corpus: all 19 planted pairs
    * (i-1, i) for i = 10..190 step 10 must surface as candidates. */
  def nearDupResult(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensureDocs(spark)
    val sess = driveSession(spark, dir)
    val qn = s"strm_nd_${nameSeq.incrementAndGet()}"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = sess.readStream.schema(schema).parquet(dir)
    val out = drain(
      StatefulOps.nearDupCandidates(stream, "text", "doc_id")
        .toDF("id_a", "id_b"),
      qn, extraBatch = false)
    out.filter(col("id_b") === col("id_a") + 1 && col("id_b") % 10 === 0)
      .select("id_a", "id_b").distinct()
      .agg(count(lit(1)).as("planted_found"))
  }

  /** keySummaryStream keyed by event_type with a gap wider than the
    * fixture's whole span → one session per key, flushed by the
    * sentinel; equals `count/min/max GROUP BY event_type`. */
  def sessionsResult(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensureStore(spark, sfDir)
    val sess = driveSession(spark, dir)
    val qn = s"strm_sess_${nameSeq.incrementAndGet()}"
    val out = drain(
      StatefulOps.keySummaryStream(sess, dir, "*", keyCol = "event_type",
        gapMs = 90L * 86400L * 1000L).toDF(),
      qn, extraBatch = true)
    out.filter(col("key") =!= Sentinel)
      .select(col("key"), col("hits"), col("first_time"), col("last_time"))
      .orderBy("key")
  }
}
