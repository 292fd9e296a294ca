package graft.server

/** Poll-to-poll delivery state of one live tail, mirroring the reference's
  * tailProcessor (app/vlselect/logsql/logsql.go:581-689):
  *
  *   - rows group per `_stream_id` (empty when the row carries none);
  *   - within a stream, rows STABLE-sort by timestamp, the prefix at or
  *     before the stream's last delivered timestamp is dropped (poll
  *     windows overlap by design — `tailOffsetNsecs`, logsql.go:578 — so
  *     re-delivered rows are skipped by timestamp, not by content), and
  *     the stream's watermark advances to its last emitted row;
  *   - emission order is a stable timestamp sort across streams.
  *
  * The reference iterates its per-stream map in Go's randomized order
  * before the final stable sort, so cross-stream timestamp ties have no
  * pinned order there; this implementation visits streams in sorted-id
  * order — one of the reference's admissible outcomes, deterministically.
  *
  * Not thread-safe: one instance per tail request, driven by its poll
  * loop (the reference takes a mutex because its writeBlock callbacks
  * are concurrent; here rows arrive as one collected batch per poll).
  */
final class TailState {
  private val lastTimestamps = scala.collection.mutable.Map.empty[String, Long]

  /** One poll's rows `(streamId, timestamp, payload)` in arrival order →
    * the rows to deliver, in delivery order. */
  def advance[T](rows: Seq[(String, Long, T)]): Seq[(String, Long, T)] = {
    val out = Seq.newBuilder[(String, Long, T)]
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (sid, rs) =>
      val sorted = rs.sortBy(_._2) // stable: arrival order kept within ties
      val fresh = lastTimestamps.get(sid) match {
        case Some(last) => sorted.dropWhile(_._2 <= last)
        case None       => sorted
      }
      if (fresh.nonEmpty) {
        out ++= fresh
        lastTimestamps(sid) = fresh.last._2
      }
    }
    out.result().sortBy(_._2) // stable: per-stream order kept within ties
  }

  /** Last delivered timestamp per stream (tests/diagnostics). */
  def watermarks: Map[String, Long] = lastTimestamps.toMap
}
