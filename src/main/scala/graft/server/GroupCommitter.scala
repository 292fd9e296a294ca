package graft.server

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.{CompletableFuture, LinkedBlockingQueue, TimeUnit}

import graft.streaming.Ingest

/** Group-commit batcher for the HTTP ingest path.
  *
  * The reference ingests by parsing request bodies into a shared in-memory
  * part that a background job persists (lib/logstorage/storage.go:525,
  * datadb.go in-memory parts) — one storage write covers many concurrent
  * requests. The Spark analogue: handlers enqueue their RAW payload lines
  * keyed by (protocol, parse params, stream fields, tenant) and block on a
  * future; a single flusher thread drains everything queued, concatenates
  * each group's lines into ONE parallelized DataFrame, parses once, and
  * runs ONE [[Ingest.appendBatch]] per group. While that write job runs,
  * newly arriving requests accumulate into the next batch — batch size
  * adapts to load with no fixed-timer latency: an idle server commits a
  * lone request immediately; a loaded server amortizes the Spark job
  * across every request that arrived during the previous write.
  *
  * Buffering lines (not per-request DataFrames) matters twice over: the
  * flush plan has a CONSTANT shape (one source, one parser) so whole-stage
  * codegen caches across flushes instead of recompiling an N-way union,
  * and the parse runs across executor threads instead of inside a
  * single-partition LocalTableScan.
  *
  * Completing the future only after the append keeps read-your-writes: a
  * 200 response still means the rows are queryable, exactly like the
  * previous one-job-per-POST behavior that capped sustained ingest at
  * ~10 req/s.
  */
object GroupCommitter {
  /** Raw request payload: protocol lines (jsonline/bulk lines, or whole
    * JSON bodies for the explode-style parsers), or rows already decoded
    * driver-side (the protobuf transports). */
  sealed trait Payload
  final case class Lines(lines: Seq[String]) extends Payload
  final case class Rows(
    rows: Seq[(java.sql.Timestamp, String, Map[String, String])]) extends Payload

  private final case class Entry(payload: Payload, key: String,
                                 build: DataFrame => DataFrame,
                                 streamFields: Seq[String], tenant: String,
                                 done: CompletableFuture[Unit])
}

final class GroupCommitter(spark: SparkSession, storeDir: String,
                           maxBatchEntries: Int = 4096,
                           lingerMs: Long = 25L) {
  import GroupCommitter.{Entry, Lines, Payload, Rows}

  private val queue = new LinkedBlockingQueue[Entry]()
  @volatile private var closed = false

  // observability for specs/bench: requests in vs write jobs out
  private val enqueuedCount = new java.util.concurrent.atomic.AtomicLong
  private val flushCount = new java.util.concurrent.atomic.AtomicLong
  def enqueued: Long = enqueuedCount.get
  def flushes: Long = flushCount.get

  private def linesDF(lines: Seq[String]): DataFrame = {
    import spark.implicits._
    // parallelize so the parse fans out instead of running in one
    // LocalTableScan task; slice size keeps tiny batches single-task
    val slices = math.min(32, math.max(1, lines.size / 2048))
    spark.createDataset(spark.sparkContext.parallelize(lines, slices)).toDF("value")
  }

  private def rowsDF(
      rows: Seq[(java.sql.Timestamp, String, Map[String, String])]): DataFrame = {
    import spark.implicits._
    val slices = math.min(32, math.max(1, rows.size / 2048))
    spark.createDataset(spark.sparkContext.parallelize(rows, slices))
      .toDF("_time", "_msg", "fields")
  }

  private def toDF(p: Payload): DataFrame = p match {
    case Lines(ls) => linesDF(ls)
    case Rows(rs) => rowsDF(rs)
  }

  private def merged(ps: Seq[Payload]): DataFrame = ps match {
    case Seq(one) => toDF(one)
    case many if many.forall(_.isInstanceOf[Lines]) =>
      linesDF(many.flatMap(_.asInstanceOf[Lines].lines))
    case many if many.forall(_.isInstanceOf[Rows]) =>
      rowsDF(many.flatMap(_.asInstanceOf[Rows].rows))
    case many => // mixed kinds under one key can't happen from IngestServer,
      // but merge defensively via union of built frames
      many.map(toDF).reduce(_.unionByName(_))
  }

  private val flusher = new Thread(() => {
    while (!closed || !queue.isEmpty) {
      val first =
        try queue.poll(100, TimeUnit.MILLISECONDS)
        catch { case _: InterruptedException => null }
      if (first != null) {
        // linger briefly so a concurrent request wave lands in ONE flush —
        // without it the flusher races ahead of the wave and commits 2-3
        // stragglers per job (measured ~2x fewer write jobs under 16-way
        // load). A lone idle request pays +lingerMs latency, two orders of
        // magnitude below the write job it is about to run.
        // The linger is growth-aware: a fixed sleep still split waves
        // whose arrivals spread past it (measured 4-vs-6 flushes for the
        // same 48-request load, a 60k→38k rows/s swing), so after the
        // base sleep keep waiting in small steps WHILE the queue is still
        // growing, bounded at 4x the base. Stops one step after arrivals
        // stop — an idle tail costs one stepMs, a steady trickle is cut
        // off by the bound so a continuous stream can never starve the
        // flush.
        // guarded like the poll above: an interrupt during the linger must
        // not kill the flusher (that would leave every enqueued caller
        // timing out until restart) — the batch still flushes below
        if (lingerMs > 0) {
          try Thread.sleep(lingerMs)
          catch { case _: InterruptedException => () }
          val stepMs = math.max(1L, lingerMs / 5)
          var waited = 0L
          var last = queue.size
          var growing = true
          while (growing && waited < lingerMs * 3) {
            try Thread.sleep(stepMs)
            catch { case _: InterruptedException => () }
            waited += stepMs
            val now = queue.size
            growing = now > last
            last = now
          }
        }
        val batch = new java.util.ArrayList[Entry]()
        batch.add(first)
        queue.drainTo(batch, maxBatchEntries - 1)
        import scala.jdk.CollectionConverters._
        val entries = batch.asScala.toSeq
        entries.groupBy(e => (e.key, e.streamFields, e.tenant)).foreach {
          case ((_, fields, tenant), group) =>
            try {
              // identical key ⇒ identical build fn; parse the concatenated
              // payload once through the first entry's builder
              val t0 = System.nanoTime()
              val df = group.head.build(merged(group.map(_.payload)))
              val t1 = System.nanoTime()
              Ingest.appendBatch(df, storeDir, fields, tenant)
              val t2 = System.nanoTime()
              if (sys.env.contains("GRAFT_INGEST_DEBUG"))
                System.err.println(f"[flush] n=${group.size} build=${(t1-t0)/1e3}%.0fus append=${(t2-t1)/1e6}%.0fms")
              flushCount.incrementAndGet()
              Metrics.ingestCommits.incrementAndGet()
              group.foreach(_.done.complete(()))
            } catch {
              case _: Throwable if group.size > 1 =>
                // one bad payload must not fail the whole group: fall back
                // to per-entry appends so only the offender 400s
                group.foreach { e =>
                  try {
                    Ingest.appendBatch(e.build(toDF(e.payload)), storeDir,
                      fields, tenant)
                    flushCount.incrementAndGet()
                    Metrics.ingestCommits.incrementAndGet()
                    e.done.complete(())
                  } catch {
                    case t: Throwable => e.done.completeExceptionally(t)
                  }
                }
              case e: Throwable => group.foreach(_.done.completeExceptionally(e))
            }
        }
      }
    }
  }, "graft-ingest-commit")
  flusher.setDaemon(true)
  flusher.start()

  /** Enqueue a payload and wait until the write that includes it has
    * committed. `key` must uniquely determine `build`'s behavior (route +
    * every parse/transform param) — payloads with equal keys are
    * concatenated and parsed through one builder. Throws what the append
    * threw (so the HTTP handler can 400). */
  def append(payload: Payload, key: String, build: DataFrame => DataFrame,
             streamFields: Seq[String], tenant: String,
             timeoutMs: Long = 120000L): Unit = {
    if (closed) throw new IllegalStateException("committer closed")
    val f = new CompletableFuture[Unit]()
    enqueuedCount.incrementAndGet()
    queue.put(Entry(payload, key, build, streamFields, tenant, f))
    try f.get(timeoutMs, TimeUnit.MILLISECONDS)
    catch {
      case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
    }
  }

  /** Block until everything enqueued so far has committed (the appends are
    * synchronous per caller, so an empty queue means no invisible data —
    * this is the /internal/force_flush contract). */
  def quiesce(timeoutMs: Long = 30000L): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!queue.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    queue.isEmpty
  }

  /** Stop accepting entries; the flusher drains what's queued, then exits
    * (its poll timeout notices `closed` within ~100ms). */
  def close(): Unit = { closed = true }
}
