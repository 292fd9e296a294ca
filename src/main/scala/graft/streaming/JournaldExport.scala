package graft.streaming

import scala.collection.mutable.ArrayBuffer

/** systemd Journal Export Format parser — a port of the reference's
  * readJournaldLogEntry (app/vlinsert/journald/journald.go:229-335,
  * https://systemd.io/JOURNAL_EXPORT_FORMATS):
  *
  *  - entries are blank-line-terminated groups of fields;
  *  - a field is `KEY=value`, or BINARY: `KEY\n<8-byte LE size>data\n`
  *    (the data may contain newlines — naive line splitting corrupts it);
  *  - field names must be `A-Z0-9_` starting with a non-digit and at
  *    most 64 bytes, else the field is skipped;
  *  - `__REALTIME_TIMESTAMP` (microseconds) becomes the row timestamp
  *    and is consumed; other `__`-prefixed metadata fields are dropped;
  *  - `MESSAGE` becomes `_msg`;
  *  - `PRIORITY` ALSO emits a `level` field via the syslog priority
  *    table (0=emerg … 7=debug), keeping PRIORITY itself.
  *
  * Pinned by the reference's TestPushJournald goldens in
  * IngestProtocolConformanceSpec.
  */
object JournaldExport {

  /** (tsNanos or 0 for "use ingestion time", fields incl. _msg). */
  final case class Entry(tsNanos: Long, fields: Seq[(String, String)])

  def priorityToLevel(p: String): String = p match {
    case "0" => "emerg"
    case "1" => "alert"
    case "2" => "critical"
    case "3" => "error"
    case "4" => "warning"
    case "5" => "notice"
    case "6" => "info"
    case "7" => "debug"
    case other => other
  }

  def isValidFieldName(s: String): Boolean = {
    if (s.isEmpty || s.length > 64) return false
    val c0 = s.charAt(0)
    if (!((c0 >= 'A' && c0 <= 'Z') || c0 == '_')) return false
    s.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_')
  }

  def parse(bytes: Array[Byte],
            timeField: String = "__REALTIME_TIMESTAMP",
            msgField: String = "MESSAGE"): Seq[Entry] = {
    val out = ArrayBuffer.empty[Entry]
    var i = 0
    val n = bytes.length

    // next \n-terminated line as a byte slice (exclusive of the \n);
    // returns null at end of input
    def nextLine(): Array[Byte] = {
      if (i >= n) return null
      var j = i
      while (j < n && bytes(j) != '\n') j += 1
      val line = java.util.Arrays.copyOfRange(bytes, i, j)
      i = if (j < n) j + 1 else j
      line
    }

    var fields = ArrayBuffer.empty[(String, String)]
    var ts = 0L

    def finishEntry(): Unit = {
      if (fields.nonEmpty) out += Entry(ts, fields.toSeq)
      fields = ArrayBuffer.empty
      ts = 0L
    }

    var line = nextLine()
    while (line != null) {
      if (line.isEmpty) finishEntry()
      else {
        val eq = line.indexOf('='.toByte)
        var name: String = null
        var value: String = null
        if (eq >= 0) {
          name = new String(line, 0, eq, java.nio.charset.StandardCharsets.UTF_8)
          value = new String(line, eq + 1, line.length - eq - 1,
            java.nio.charset.StandardCharsets.UTF_8)
        } else {
          // binary field: KEY\n<8-byte LE size>data\n — accumulate
          // newline-joined chunks until the declared size is covered
          // (journald.go:268-291: every read appends the consumed '\n')
          name = new String(line, java.nio.charset.StandardCharsets.UTF_8)
          val acc = new java.io.ByteArrayOutputStream(64)
          def appendNext(): Boolean = {
            val l = nextLine()
            if (l == null) return false
            acc.write(l); acc.write('\n')
            true
          }
          while (acc.size < 8 && appendNext()) ()
          if (acc.size < 8) return out.toSeq // truncated input
          val vb = acc.toByteArray
          var size = 0L
          var k = 0
          while (k < 8) { size |= (vb(k).toLong & 0xFF) << (8 * k); k += 1 }
          while (acc.size - 8 <= size && appendNext()) ()
          val all = acc.toByteArray
          if (all.length - 8 - 1 < size) return out.toSeq // truncated
          value = new String(all, 8, size.toInt,
            java.nio.charset.StandardCharsets.UTF_8)
          if (all.length - 8 - 1 != size) return out.toSeq // size mismatch
        }

        if (name.length <= 64 && isValidFieldName(name)) {
          if (name == timeField) {
            value.toLongOption match {
              case Some(us) => ts = us * 1000L // journald micros → nanos
              case None => ts = 0L
            }
          } else {
            val outName = if (name == msgField) "_msg" else name
            if (name == "PRIORITY")
              fields += ("level" -> priorityToLevel(value))
            if (!outName.startsWith("__"))
              fields += (outName -> value)
          }
        }
      }
      line = nextLine()
    }
    finishEntry() // a final entry without a trailing blank line still lands
    out.toSeq
  }
}
