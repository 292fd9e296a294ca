package graft.server

import org.apache.spark.sql.DataFrame
import java.util.concurrent.{CompletableFuture, LinkedBlockingQueue, TimeUnit}

import graft.streaming.Ingest

/** Group-commit batcher for the HTTP ingest path.
  *
  * The reference ingests by parsing request bodies into a shared in-memory
  * part that a background job persists (lib/logstorage/storage.go:525,
  * datadb.go in-memory parts) — one storage write covers many concurrent
  * requests. The Spark analogue: one parquet write JOB covers many
  * concurrent POSTs. Handlers enqueue their parsed (lazy) DataFrame and
  * block on a future; a single flusher thread drains everything queued,
  * unions per (streamFields, tenant) group, and runs ONE
  * [[Ingest.appendBatch]] per group. While that write job runs, newly
  * arriving requests accumulate into the next batch — so batch size adapts
  * to load with no fixed-timer latency: an idle server commits a lone
  * request immediately; a loaded server amortizes the ~100ms Spark job
  * across every request that arrived during the previous write.
  *
  * Completing the future only after the append keeps read-your-writes: a
  * 200 response still means the rows are queryable, exactly like the
  * previous one-job-per-POST behavior that capped sustained ingest at
  * ~10 req/s.
  */
final class GroupCommitter(storeDir: String, maxBatchEntries: Int = 4096) {

  private final case class Entry(df: DataFrame, streamFields: Seq[String],
                                 tenant: String, done: CompletableFuture[Unit])

  private val queue = new LinkedBlockingQueue[Entry]()
  @volatile private var closed = false

  // observability for specs/bench: requests in vs write jobs out
  private val enqueuedCount = new java.util.concurrent.atomic.AtomicLong
  private val flushCount = new java.util.concurrent.atomic.AtomicLong
  def enqueued: Long = enqueuedCount.get
  def flushes: Long = flushCount.get

  private val flusher = new Thread(() => {
    while (!closed || !queue.isEmpty) {
      val first =
        try queue.poll(100, TimeUnit.MILLISECONDS)
        catch { case _: InterruptedException => null }
      if (first != null) {
        val batch = new java.util.ArrayList[Entry]()
        batch.add(first)
        queue.drainTo(batch, maxBatchEntries - 1)
        import scala.jdk.CollectionConverters._
        val entries = batch.asScala.toSeq
        entries.groupBy(e => (e.streamFields, e.tenant)).foreach {
          case ((fields, tenant), group) =>
            try {
              val union = group.map(_.df).reduce(_.unionByName(_))
              Ingest.appendBatch(union, storeDir, fields, tenant)
              flushCount.incrementAndGet()
              group.foreach(_.done.complete(()))
            } catch {
              case _: Throwable if group.size > 1 =>
                // one bad plan must not fail the whole group: fall back to
                // per-entry appends so only the offender 400s
                group.foreach { e =>
                  try {
                    Ingest.appendBatch(e.df, storeDir, fields, tenant)
                    flushCount.incrementAndGet()
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

  /** Enqueue a parsed batch and wait until the write that includes it has
    * committed. Throws what the append threw (so the HTTP handler can 400). */
  def append(parsed: DataFrame, streamFields: Seq[String], tenant: String,
             timeoutMs: Long = 120000L): Unit = {
    if (closed) throw new IllegalStateException("committer closed")
    val f = new CompletableFuture[Unit]()
    enqueuedCount.incrementAndGet()
    queue.put(Entry(parsed, streamFields, tenant, f))
    try f.get(timeoutMs, TimeUnit.MILLISECONDS)
    catch {
      case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
    }
  }

  /** Stop accepting entries; the flusher drains what's queued, then exits
    * (its poll timeout notices `closed` within ~100ms). */
  def close(): Unit = { closed = true }
}
