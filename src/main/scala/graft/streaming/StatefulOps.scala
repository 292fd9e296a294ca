package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful Structured-Streaming operators over the store's tail stream.
  *
  * The reference's "streaming" surface is a poll loop (logsql.go:497) and
  * its streams-dedup is a batch rewrite (storage lifecycle); these are the
  * event-time-native equivalents: bounded state via watermarks, custom
  * per-key state via `flatMapGroupsWithState` — state lives in the
  * streaming state store (RocksDB/HDFS-backed on a cluster), never on the
  * driver, so both scale with executors.
  */
object StatefulOps {

  /** Streaming exact dedup: the first row per key passes through, repeats
    * within the watermark are dropped, and per-key state is GARBAGE
    * COLLECTED once the watermark passes (dropDuplicatesWithinWatermark) —
    * unbounded-retention dedup state is the classic way a streaming dedup
    * falls over at scale. Keys are any subset of columns. */
  def dedupStream(spark: SparkSession, dir: String, filterText: String,
                  keyCols: Seq[String],
                  watermarkDelay: String = "10 minutes"): DataFrame =
    Ingest.tailStream(spark, dir, filterText)
      .withWatermark("_time", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming near-duplicate CANDIDATE detection: the incremental form
    * of Dedup.minhashLSH for a document stream — every incoming doc is
    * checked against the corpus seen SO FAR, not just its own
    * micro-batch. Docs explode to (band bucket, id); per-bucket state
    * holds the ≤`maxBucketSize` member ids, and each new member emits a
    * candidate pair against every existing member before joining the
    * state. Over-cap buckets stop ADMITTING members: unlike the batch
    * op, which retroactively drops an over-cap bucket's pairs, a stream
    * cannot un-emit — so a pathological bucket contributes the pairs of
    * its FIRST maxBucketSize arrivals (arrival-order dependent), then
    * goes quiet. Candidates are a verification input either way;
    * identical docs remain exact dedup's job.
    *
    * Emitted pairs are CANDIDATES (id_a < id_b, possibly repeated when
    * two docs share several buckets): verification — signature Jaccard /
    * exact n-gram — is a batch-side join, exactly like the batch op's
    * second phase. State is per-bucket id lists in the streaming state
    * store (RocksDB on a cluster); `ttlMs` > 0 expires idle buckets via
    * a processing-time timeout so unbounded retention is opt-in, not the
    * default failure mode. Note: a processing-time timeout makes the
    * engine schedule timeout-check batches continuously even when idle —
    * pair it with a real trigger interval (production), not with
    * processAllAvailable-style drives. */
  def nearDupCandidates(docs: DataFrame, textCol: String, idCol: String,
                        shingleSize: Int = 3, numHashes: Int = 128,
                        bands: Int = 32, maxBucketSize: Int = 64,
                        ttlMs: Long = 0L): Dataset[(Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be a multiple of bands ($bands)")
    val bandRows = docs.select(
        col(idCol).cast("long").as("id"),
        graft.ops.Dedup.minhashSignature(col(textCol), shingleSize, numHashes)
          .as("sig"))
      .select(col("id"),
        explode(graft.functions.MinHashSim.bandHashes(col("sig"), bands))
          .as("bucket"))
      .as[(Long, Long)]
    val timeoutKind =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    bandRows.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutKind) {
        (_: Long, rows: Iterator[(Long, Long)], state: GroupState[List[Long]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val before = state.getOption.getOrElse(Nil)
            var members = before
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
            rows.foreach { case (id, _) =>
              if (members.length < maxBucketSize && !members.contains(id)) {
                members.foreach { m =>
                  out += (if (m < id) (m, id) else (id, m))
                }
                members = id :: members
              }
            }
            // skip the state-store write when nothing changed: a full or
            // replayed bucket must not rewrite its member list (RocksDB
            // write amplification on exactly the hot buckets)
            if (members ne before) state.update(members)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
      }
  }

  /** Closed per-key activity summary (hits + first/last event time),
    * emitted once the key has been silent for `gap` of EVENT time — i.e.
    * session-gap semantics, the streaming counterpart of
    * `stats by (key) count(), min(_time), max(_time)` that can actually
    * emit results on an unbounded stream. */
  final case class KeySummary(key: String, hits: Long,
                              first_time: java.sql.Timestamp,
                              last_time: java.sql.Timestamp)

  /** Custom state machine via flatMapGroupsWithState + EventTimeTimeout:
    * rows accumulate into per-key state; when the watermark passes
    * last_time + gap the state times out, emits its summary downstream,
    * and is removed. Run with OutputMode.Append. */
  def keySummaryStream(spark: SparkSession, dir: String, filterText: String,
                       keyCol: String, gapMs: Long,
                       watermarkDelay: String = "0 seconds"): Dataset[KeySummary] = {
    import spark.implicits._
    val src = Ingest.tailStream(spark, dir, filterText)
      .withWatermark("_time", watermarkDelay)
      .select(col(keyCol).cast("string").as("_1"), col("_time").as("_2"))
      .as[(String, java.sql.Timestamp)]
    src.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp)],
         state: GroupState[KeySummary]) =>
          if (state.hasTimedOut) {
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            var s = state.getOption.getOrElse(KeySummary(key, 0L, null, null))
            rows.foreach { case (_, t) =>
              val first =
                if (s.first_time == null || t.before(s.first_time)) t
                else s.first_time
              val last =
                if (s.last_time == null || t.after(s.last_time)) t
                else s.last_time
              s = KeySummary(key, s.hits + 1, first, last)
            }
            state.update(s)
            // close the session once event time moves `gap` past the
            // last activity (must be beyond the current watermark or the
            // state store rejects it)
            state.setTimeoutTimestamp(
              math.max(s.last_time.getTime + gapMs,
                state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
