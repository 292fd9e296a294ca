package graft.server

import java.io.ByteArrayOutputStream

/** Wire codecs for the reference's cluster-internal HTTP protocol, so a
  * reference `vlinsert` front can forward rows to this engine as if it
  * were a `vlstorage` node, and a reference `vlselect` front can fan a
  * query out to it.
  *
  * Formats (all integers big-endian fixed or LEB128 varints):
  *   - varint / length-prefixed bytes: VictoriaMetrics lib/encoding
  *     MarshalVarUint64 (int.go:287, = binary.Uvarint) and MarshalBytes
  *     (varint length + raw bytes).
  *   - InsertRow (lib/logstorage/log_rows.go:684): accountID u32be,
  *     projectID u32be (tenant_id.go:54), StreamTagsCanonical bytes,
  *     timestamp u64be nanos, field count varint, then (name bytes,
  *     value bytes) per field (rows.go:35).
  *   - StreamTagsCanonical (stream_tags.go:102): tag count varint, then
  *     (name bytes, value bytes) per tag, sorted by name.
  *   - DataBlock (storage_search.go:900): row count varint, column count
  *     varint, then per column: name bytes, 1 type byte (0 = const with
  *     one value, 1 = regular with rowsCount values).
  *   - ValueWithHits (storage_search.go:385): value bytes, hits u64be.
  *
  * The `/internal/select/...` response framing mirrors
  * app/vlselect/internalselect/internalselect.go: query responses are a
  * stream of [u64be length][payload] chunks, each payload zstd level-1
  * compressed unless `disable_compression=true`; the metadata endpoints
  * return one unframed (optionally compressed) concatenation of
  * ValueWithHits entries.
  */
object InternalProto {

  /** Insert protocol version (app/vlstorage/netinsert/netinsert.go:33). */
  val InsertProtocolVersion = "v1"
  /** Select protocol versions (app/vlstorage/netselect/netselect.go). */
  val SelectProtocolVersion = "v1"

  // ------------------------------------------------------------- writing

  def putVarUint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  def putBytes(out: ByteArrayOutputStream, b: Array[Byte]): Unit = {
    putVarUint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  def putString(out: ByteArrayOutputStream, s: String): Unit =
    putBytes(out, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def putU32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  def putU64(out: ByteArrayOutputStream, v: Long): Unit = {
    putU32(out, (v >>> 32).toInt); putU32(out, v.toInt)
  }

  // ------------------------------------------------------------- reading

  /** Mutable cursor over a byte array; decode helpers throw
    * IllegalArgumentException on malformed input (mapped to HTTP 400). */
  final class Reader(val src: Array[Byte]) {
    var pos: Int = 0
    def hasRemaining: Boolean = pos < src.length
    private def fail(what: String): Nothing =
      throw new IllegalArgumentException(
        s"cannot unmarshal $what at offset $pos of ${src.length}-byte payload")

    def varUint(): Long = {
      var shift = 0
      var v = 0L
      while (true) {
        if (pos >= src.length || shift > 63) fail("varint")
        val b = src(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      v // unreachable
    }

    def bytes(): Array[Byte] = {
      val n = varUint()
      if (n < 0 || n > (src.length - pos).toLong) fail(s"$n-byte field")
      val b = java.util.Arrays.copyOfRange(src, pos, pos + n.toInt)
      pos += n.toInt
      b
    }

    def string(): String =
      new String(bytes(), java.nio.charset.StandardCharsets.UTF_8)

    def u32(): Int = {
      if (src.length - pos < 4) fail("uint32")
      val v = ((src(pos) & 0xff) << 24) | ((src(pos + 1) & 0xff) << 16) |
        ((src(pos + 2) & 0xff) << 8) | (src(pos + 3) & 0xff)
      pos += 4
      v
    }

    def u64(): Long = {
      val hi = u32().toLong & 0xffffffffL
      val lo = u32().toLong & 0xffffffffL
      (hi << 32) | lo
    }
  }

  // ---------------------------------------------------------- insert rows

  /** One decoded native-protocol insert row. `tenant` is the engine's
    * canonical "account:project" form; `tags` are the stream identity. */
  final case class InsertRow(tenant: String, tags: Seq[(String, String)],
                             tsNs: Long, fields: Seq[(String, String)])

  /** Decode a /internal/insert body: concatenated InsertRow records. */
  def parseInsertRows(body: Array[Byte]): Seq[InsertRow] = {
    val r = new Reader(body)
    val rows = Seq.newBuilder[InsertRow]
    var i = 0
    while (r.hasRemaining) {
      try {
        val acct = r.u32(); val proj = r.u32()
        val tagsR = new Reader(r.bytes())
        val nTags = tagsR.varUint()
        val tags = (0L until nTags).map(_ => tagsR.string() -> tagsR.string())
        val ts = r.u64()
        val nFields = r.varUint()
        if (nFields > 10000)
          throw new IllegalArgumentException(s"too many fields: $nFields")
        val fields = (0L until nFields).map(_ => r.string() -> r.string())
        rows += InsertRow(
          s"${acct.toLong & 0xffffffffL}:${proj.toLong & 0xffffffffL}",
          tags, ts, fields)
      } catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(s"cannot parse row #$i: ${e.getMessage}")
      }
      i += 1
    }
    rows.result()
  }

  /** Encode one InsertRow (the test-side inverse + client forwarding). */
  def marshalInsertRow(out: ByteArrayOutputStream, row: InsertRow): Unit = {
    val Array(a, p) = row.tenant.split(":", 2)
    putU32(out, java.lang.Long.parseLong(a).toInt)
    putU32(out, java.lang.Long.parseLong(p).toInt)
    val tags = new ByteArrayOutputStream()
    // canonical = sorted by tag name (stream_tags.go:103 sort.Sort)
    val sorted = row.tags.sortBy(_._1)
    putVarUint(tags, sorted.length.toLong)
    sorted.foreach { case (k, v) => putString(tags, k); putString(tags, v) }
    putBytes(out, tags.toByteArray)
    putU64(out, row.tsNs)
    putVarUint(out, row.fields.length.toLong)
    row.fields.foreach { case (k, v) => putString(out, k); putString(out, v) }
  }

  // ----------------------------------------------------------- datablocks

  /** Marshal one DataBlock from column names + per-column row values.
    * Columns whose values are all equal use the const encoding, like the
    * reference (storage_search.go:916 areConstValues). */
  def marshalDataBlock(out: ByteArrayOutputStream, names: Seq[String],
                       cols: Seq[Array[String]], rows: Int): Unit = {
    putVarUint(out, rows.toLong)
    putVarUint(out, names.length.toLong)
    names.indices.foreach { i =>
      putString(out, names(i))
      val vs = cols(i)
      if (rows > 0 && vs.forall(_ == vs(0))) {
        out.write(0) // valuesTypeConst
        putString(out, vs(0))
      } else {
        out.write(1) // valuesTypeRegular
        vs.foreach(putString(out, _))
      }
    }
  }

  /** Decode a concatenation of DataBlocks into (columnNames, rows) pairs
    * (test-side + a would-be distributed-select client). */
  def unmarshalDataBlocks(data: Array[Byte]): Seq[(Seq[String], Seq[Seq[String]])] = {
    val r = new Reader(data)
    val blocks = Seq.newBuilder[(Seq[String], Seq[Seq[String]])]
    while (r.hasRemaining) {
      val rows = r.varUint().toInt
      val nCols = r.varUint().toInt
      val names = Seq.newBuilder[String]
      val cols = Seq.newBuilder[Seq[String]]
      (0 until nCols).foreach { _ =>
        names += r.string()
        val tpe = { if (!r.hasRemaining) throw new IllegalArgumentException(
          "missing column value type"); val b = r.src(r.pos); r.pos += 1; b }
        tpe match {
          case 0 => val v = r.string(); cols += Seq.fill(rows)(v)
          case 1 => cols += (0 until rows).map(_ => r.string())
          case t => throw new IllegalArgumentException(s"unknown value type $t")
        }
      }
      val colSeq = cols.result()
      blocks += names.result() -> (0 until rows).map(i => colSeq.map(_(i)))
    }
    blocks.result()
  }

  // ------------------------------------------------------- values+hits

  def marshalValuesWithHits(out: ByteArrayOutputStream,
                            vhs: Seq[(String, Long)]): Unit =
    vhs.foreach { case (v, hits) => putString(out, v); putU64(out, hits) }

  def unmarshalValuesWithHits(data: Array[Byte]): Seq[(String, Long)] = {
    val r = new Reader(data)
    val out = Seq.newBuilder[(String, Long)]
    while (r.hasRemaining) out += r.string() -> r.u64()
    out.result()
  }

  // ---------------------------------------------------------- tenant ids

  /** `tenant_ids` select arg: raw concatenated (u32be, u32be) pairs
    * (tenant_id.go:124 MarshalTenantIDs), URL-escaped as opaque bytes. */
  def parseTenantIds(raw: Array[Byte]): Seq[String] = {
    val r = new Reader(raw)
    val out = Seq.newBuilder[String]
    while (r.hasRemaining)
      out += s"${r.u32().toLong & 0xffffffffL}:${r.u32().toLong & 0xffffffffL}"
    out.result()
  }

  def marshalTenantIds(tenants: Seq[String]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    tenants.foreach { t =>
      val Array(a, p) = t.split(":", 2)
      putU32(out, java.lang.Long.parseLong(a).toInt)
      putU32(out, java.lang.Long.parseLong(p).toInt)
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- zstd

  /** zstd level 1, like the reference's
    * lib/encoding/zstd CompressLevel(..., 1) on every internal response. */
  def zstdCompress(b: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(b, 1)

  def zstdDecompress(b: Array[Byte]): Array[Byte] = {
    val in = new com.github.luben.zstd.ZstdInputStream(
      new java.io.ByteArrayInputStream(b))
    try in.readAllBytes() finally in.close()
  }
}
