package graft.streaming

/** Dependency-free protobuf wire-format primitives shared by the Loki and
  * OTLP ingestion parsers. The wire format has three shapes we care about
  * — varint, fixed 64/32, length-delimited — and unknown fields are
  * skippable by design, which keeps hand-rolled readers robust against
  * schema additions. */
private[streaming] object ProtoWire {

  final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0
      var res = 0L
      while (true) {
        val b = buf(pos); pos += 1
        res |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return res
        shift += 7
      }
      res
    }
    def readFixed64(): Long = {
      var res = 0L
      var i = 0
      while (i < 8) { res |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      res
    }
    def readTag(): (Int, Int) = {
      val v = readVarint()
      ((v >>> 3).toInt, (v & 7).toInt)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => pos += readVarint().toInt
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"bad wire type $other")
    }
    /** Length-delimited payload → sub-reader over the same buffer. */
    def sub(): Reader = {
      val n = readVarint().toInt
      val r = new Reader(buf, pos, pos + n)
      pos += n
      r
    }
    def readString(): String = {
      val n = readVarint().toInt
      val s = new String(buf, pos, n, java.nio.charset.StandardCharsets.UTF_8)
      pos += n
      s
    }
  }

  // --------------------------------------------------- writer (client/test)

  def writeVarint(bos: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { bos.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    bos.write(v.toInt)
  }

  def writeFixed64(bos: java.io.ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeVarint(bos, (field.toLong << 3) | 1)
    var i = 0
    while (i < 8) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  def writeField(bos: java.io.ByteArrayOutputStream, field: Int,
                 payload: Array[Byte]): Unit = {
    writeVarint(bos, (field.toLong << 3) | 2)
    writeVarint(bos, payload.length.toLong)
    bos.write(payload)
  }

  def writeString(bos: java.io.ByteArrayOutputStream, field: Int, s: String): Unit =
    writeField(bos, field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
