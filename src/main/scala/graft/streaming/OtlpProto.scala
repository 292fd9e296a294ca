package graft.streaming

import ProtoWire.Reader

/** Protobuf reader for OTLP/HTTP logs (opentelemetry-proto, public schema;
  * reference app/vlinsert/opentelemetry/opentelemetry.go handles the same
  * payload). Message shapes (field numbers from logs.proto / common.proto):
  *
  * {{{
  *   ExportLogsServiceRequest { repeated ResourceLogs resource_logs = 1; }
  *   ResourceLogs { Resource resource = 1; repeated ScopeLogs scope_logs = 2; }
  *   Resource     { repeated KeyValue attributes = 1; }
  *   ScopeLogs    { repeated LogRecord log_records = 2; }
  *   LogRecord    { fixed64 time_unix_nano = 1; uint32 severity_number = 2;
  *                  string severity_text = 3; AnyValue body = 5;
  *                  repeated KeyValue attributes = 6;
  *                  fixed64 observed_time_unix_nano = 11; }
  *   KeyValue     { string key = 1; AnyValue value = 2; }
  *   AnyValue     { oneof { string_value = 1; bool_value = 2; int_value = 3;
  *                          double_value = 4; ... bytes_value = 7; } }
  * }}}
  */
object OtlpProto {

  final case class Record(tsNanos: Long, severityText: String, body: String,
                          resAttrs: Map[String, String],
                          attrs: Map[String, String])

  private def parseAnyValue(r: Reader): String = {
    var out = ""
    while (r.hasMore) {
      val (f, w) = r.readTag()
      (f, w) match {
        case (1, 2) => out = r.readString()
        case (2, 0) => out = if (r.readVarint() != 0) "true" else "false"
        case (3, 0) => out = r.readVarint().toString
        case (4, 1) => out = java.lang.Double.longBitsToDouble(r.readFixed64()).toString
        case (7, 2) =>
          val n = r.readVarint().toInt
          out = java.util.Base64.getEncoder.encodeToString(
            java.util.Arrays.copyOfRange(r.buf, r.pos, r.pos + n))
          r.pos += n
        case _ => r.skip(w) // arrays / kvlists render as empty (unused here)
      }
    }
    out
  }

  private def parseKeyValues(r: Reader, kvField: Int): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    while (r.hasMore) {
      val (f, w) = r.readTag()
      if (f == kvField && w == 2) {
        val kv = r.sub()
        var k = ""
        var v = ""
        while (kv.hasMore) {
          val (kf, kw) = kv.readTag()
          if (kf == 1 && kw == 2) k = kv.readString()
          else if (kf == 2 && kw == 2) v = parseAnyValue(kv.sub())
          else kv.skip(kw)
        }
        if (k.nonEmpty) out(k) = v
      } else r.skip(w)
    }
    out.toMap
  }

  /** Decode an ExportLogsServiceRequest body (already decompressed). */
  def parseExportLogs(body: Array[Byte]): Seq[Record] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    val req = new Reader(body, 0, body.length)
    while (req.hasMore) {
      val (f, w) = req.readTag()
      if (f == 1 && w == 2) { // ResourceLogs
        val rl = req.sub()
        var resAttrs = Map.empty[String, String]
        val scopes = scala.collection.mutable.ArrayBuffer.empty[Reader]
        while (rl.hasMore) {
          val (rf, rw) = rl.readTag()
          if (rf == 1 && rw == 2) resAttrs = parseKeyValues(rl.sub(), 1)
          else if (rf == 2 && rw == 2) scopes += rl.sub()
          else rl.skip(rw)
        }
        scopes.foreach { sl =>
          while (sl.hasMore) {
            val (sf, sw) = sl.readTag()
            if (sf == 2 && sw == 2) { // LogRecord
              val lr = sl.sub()
              var ts = 0L
              var obsTs = 0L
              var sev = ""
              var body = ""
              var attrs = Map.empty[String, String]
              while (lr.hasMore) {
                val (lf, lw) = lr.readTag()
                (lf, lw) match {
                  case (1, 1) => ts = lr.readFixed64()
                  case (3, 2) => sev = lr.readString()
                  case (5, 2) => body = parseAnyValue(lr.sub())
                  case (6, 2) =>
                    // one KeyValue per tag occurrence
                    val kv = lr.sub()
                    var k = ""
                    var v = ""
                    while (kv.hasMore) {
                      val (kf, kw) = kv.readTag()
                      if (kf == 1 && kw == 2) k = kv.readString()
                      else if (kf == 2 && kw == 2) v = parseAnyValue(kv.sub())
                      else kv.skip(kw)
                    }
                    if (k.nonEmpty) attrs = attrs + (k -> v)
                  case (11, 1) => obsTs = lr.readFixed64()
                  case _ => lr.skip(lw)
                }
              }
              out += Record(if (ts != 0) ts else obsTs, sev, body, resAttrs, attrs)
            } else sl.skip(sw)
          }
        }
      } else req.skip(w)
    }
    out.toSeq
  }

  // --------------------------------------------------------- writer (test)

  import ProtoWire._

  private def anyString(s: String): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    writeString(b, 1, s)
    b.toByteArray
  }

  private def keyValue(k: String, v: String): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    writeString(b, 1, k)
    writeField(b, 2, anyString(v))
    b.toByteArray
  }

  /** Encode an ExportLogsServiceRequest (test/dev client side). */
  def encodeExportLogs(records: Seq[Record]): Array[Byte] = {
    val req = new java.io.ByteArrayOutputStream()
    records.groupBy(_.resAttrs).foreach { case (resAttrs, rs) =>
      val rl = new java.io.ByteArrayOutputStream()
      val res = new java.io.ByteArrayOutputStream()
      resAttrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
        writeField(res, 1, keyValue(k, v))
      }
      writeField(rl, 1, res.toByteArray)
      val sl = new java.io.ByteArrayOutputStream()
      rs.foreach { r =>
        val lr = new java.io.ByteArrayOutputStream()
        writeFixed64(lr, 1, r.tsNanos)
        if (r.severityText.nonEmpty) writeString(lr, 3, r.severityText)
        writeField(lr, 5, anyString(r.body))
        r.attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
          writeField(lr, 6, keyValue(k, v))
        }
        writeField(sl, 2, lr.toByteArray)
      }
      writeField(rl, 2, sl.toByteArray)
      writeField(req, 1, rl.toByteArray)
    }
    req.toByteArray
  }
}
