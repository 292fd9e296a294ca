package graft.streaming

/** RFC 6587 syslog TCP framing — a port of the reference's
  * syslogLineReader (app/vlinsert/syslog/syslog.go nextLine):
  *
  *  - leading newlines before a frame are skipped;
  *  - a frame whose first byte is a digit is OCTET-COUNTED: the digit
  *    run up to the first space is the byte length of the message that
  *    follows (non-numeric prefixes and over-limit lengths are ERRORS);
  *  - anything else is OCTET-STUFFING: the message runs to the next
  *    newline (stripped); at EOF the remaining bytes — including a
  *    trailing newline the reference keeps — are the message.
  *
  * Pinned by the reference's TestSyslogLineReader_{Success,Failure}
  * tables in SyslogFramingConformanceSpec.
  */
final class SyslogLineReader(in: java.io.InputStream,
                             maxLen: Int = 256 << 10) {
  private val br = new java.io.BufferedInputStream(in, 64 << 10)
  private var lineBytes: Array[Byte] = Array.emptyByteArray
  private var errMsg: Option[String] = None

  def line: String = new String(lineBytes, java.nio.charset.StandardCharsets.UTF_8)
  def error: Option[String] = errMsg

  /** Bytes until (and including) the next space, or to EOF. Empty at EOF. */
  private def readPrefix(): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(32)
    var b = br.read()
    while (b >= 0) {
      buf.write(b)
      if (b == ' ') return buf.toByteArray
      b = br.read()
    }
    buf.toByteArray
  }

  def nextLine(): Boolean = {
    if (errMsg.isDefined) return false
    var prefix = readPrefix()
    // skip empty lines, re-reading when a prefix was ONLY newlines
    var guard = 0
    while ({
      var i = 0
      while (i < prefix.length && prefix(i) == '\n') i += 1
      prefix = prefix.drop(i)
      prefix.isEmpty && { guard += 1; guard < 1000000 }
    }) {
      prefix = readPrefix()
      if (prefix.isEmpty) return false // EOF
    }
    if (prefix.isEmpty) return false

    if (prefix(0) >= '0' && prefix(0) <= '9') {
      // octet-counting: the digit run before the space is the byte count
      val lenStr = new String(prefix, 0, prefix.length - 1,
        java.nio.charset.StandardCharsets.UTF_8)
      val msgLen =
        try java.lang.Long.parseUnsignedLong(lenStr)
        catch {
          case _: NumberFormatException =>
            errMsg = Some(s"cannot parse message length from '$lenStr'")
            return false
        }
      if (msgLen > maxLen) {
        errMsg = Some(
          s"cannot read message longer than $maxLen bytes; msgLen=$msgLen")
        return false
      }
      val buf = new Array[Byte](msgLen.toInt)
      var off = 0
      while (off < buf.length) {
        val n = br.read(buf, off, buf.length - off)
        if (n < 0) {
          errMsg = Some(s"cannot read message with size $msgLen bytes: EOF")
          return false
        }
        off += n
      }
      lineBytes = buf
      true
    } else {
      // octet-stuffing: prefix + bytes to the next newline (stripped);
      // EOF keeps whatever was read, trailing newline included
      val buf = new java.io.ByteArrayOutputStream(256)
      buf.write(prefix)
      var b = br.read()
      while (b >= 0 && b != '\n') { buf.write(b); b = br.read() }
      lineBytes = buf.toByteArray
      true
    }
  }
}
