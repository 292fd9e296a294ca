package graft.streaming

/** Minimal protobuf wire-format reader for the Loki push protocol
  * (app/vlinsert/loki/loki_protobuf.go; message shapes from logproto):
  *
  * {{{
  *   PushRequest  { repeated StreamAdapter streams = 1; }
  *   StreamAdapter{ string labels = 1; repeated EntryAdapter entries = 2; }
  *   EntryAdapter { Timestamp timestamp = 1; string line = 2; }
  *   Timestamp    { int64 seconds = 1; int32 nanos = 2; }
  * }}}
  *
  * Bodies arrive snappy-compressed (block format). The wire format is
  * three primitives — varint, 64/32-bit, length-delimited — so a
  * dependency-free reader stays small; unknown fields are skipped, which
  * also future-proofs against added fields (structured metadata, hash).
  */
object LokiProto {

  final case class Entry(tsNanos: Long, line: String,
                         labels: Map[String, String])

  import ProtoWire.Reader

  /** `{app="web",env="prod"}` → label map (Prometheus label-set rendering,
    * same form the JSON path's `stream` object carries). */
  private[streaming] def parseLabels(s: String): Map[String, String] = {
    val re = """([a-zA-Z_][a-zA-Z0-9_]*)="((?:[^"\\]|\\.)*)"""".r
    re.findAllMatchIn(s).map { m =>
      m.group(1) -> m.group(2).replaceAll("""\\(.)""", "$1")
    }.toMap
  }

  /** Decode a (possibly snappy-compressed) PushRequest body. */
  def parsePushRequest(body: Array[Byte]): Seq[Entry] = {
    val raw =
      try org.xerial.snappy.Snappy.uncompress(body)
      catch { case _: Exception => body } // already uncompressed
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    val req = new Reader(raw, 0, raw.length)
    while (req.hasMore) {
      val (field, wt) = req.readTag()
      if (field == 1 && wt == 2) { // StreamAdapter
        val stream = req.sub()
        var labels = Map.empty[String, String]
        val entries = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
        while (stream.hasMore) {
          val (f, w) = stream.readTag()
          if (f == 1 && w == 2) labels = parseLabels(stream.readString())
          else if (f == 2 && w == 2) { // EntryAdapter
            val entry = stream.sub()
            var ts = 0L
            var line = ""
            while (entry.hasMore) {
              val (ef, ew) = entry.readTag()
              if (ef == 1 && ew == 2) { // Timestamp
                val t = entry.sub()
                var secs = 0L
                var nanos = 0L
                while (t.hasMore) {
                  val (tf, tw) = t.readTag()
                  if (tf == 1 && tw == 0) secs = t.readVarint()
                  else if (tf == 2 && tw == 0) nanos = t.readVarint()
                  else t.skip(tw)
                }
                ts = secs * 1000000000L + nanos
              } else if (ef == 2 && ew == 2) line = entry.readString()
              else entry.skip(ew)
            }
            entries += ((ts, line))
          } else stream.skip(w)
        }
        entries.foreach { case (ts, line) => out += Entry(ts, line, labels) }
      } else req.skip(wt)
    }
    out.toSeq
  }

  // ------------------------------------------------------- writer (client)

  import ProtoWire.{writeVarint, writeField}

  /** Encode + snappy-compress a PushRequest (test/dev client side). */
  def encodePushRequest(entries: Seq[Entry]): Array[Byte] = {
    val req = new java.io.ByteArrayOutputStream()
    entries.groupBy(_.labels).foreach { case (labels, es) =>
      val stream = new java.io.ByteArrayOutputStream()
      val labelStr = labels.toSeq.sortBy(_._1)
        .map { case (k, v) => s"""$k="${v.replace("\\", "\\\\").replace("\"", "\\\"")}"""" }
        .mkString("{", ",", "}")
      writeField(stream, 1, labelStr.getBytes("UTF-8"))
      es.foreach { e =>
        val ts = new java.io.ByteArrayOutputStream()
        writeVarint(ts, 1L << 3); writeVarint(ts, e.tsNanos / 1000000000L)
        writeVarint(ts, 2L << 3); writeVarint(ts, e.tsNanos % 1000000000L)
        val entry = new java.io.ByteArrayOutputStream()
        writeField(entry, 1, ts.toByteArray)
        writeField(entry, 2, e.line.getBytes("UTF-8"))
        writeField(stream, 2, entry.toByteArray)
      }
      writeField(req, 1, stream.toByteArray)
    }
    org.xerial.snappy.Snappy.compress(req.toByteArray)
  }
}
