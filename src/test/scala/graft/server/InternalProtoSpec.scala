package graft.server

import graft.SparkSuite
import graft.store.LogStore
import java.io.ByteArrayOutputStream
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Cluster-internal native protocol conformance: byte-level goldens pin
  * the wire format against hand-encoded reference layouts
  * (lib/logstorage/log_rows.go:684 InsertRow.Marshal,
  * storage_search.go:900 DataBlock.Marshal, :385 ValueWithHits.Marshal),
  * then /internal/insert → /internal/select round-trips over HTTP like a
  * reference vlinsert/vlselect front talking to a storage node. */
class InternalProtoSpec extends SparkSuite {
  import InternalProto._

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("InsertRow marshals to the reference byte layout (hand-computed golden)") {
    val out = new ByteArrayOutputStream()
    marshalInsertRow(out, InsertRow("1:2", Seq("app" -> "web"), 100L,
      Seq("_msg" -> "hi", "level" -> "info")))
    // u32be(1) u32be(2) | tagsLen=9 [n=1 "app" "web"] | u64be(100) |
    // nFields=2 ["_msg" "hi"] ["level" "info"]
    assert(hex(out.toByteArray) ==
      "00000001" + "00000002" +
      "09" + "01" + "03617070" + "03776562" +
      "0000000000000064" +
      "02" + "045f6d7367" + "026869" + "056c6576656c" + "04696e666f")
    // and parses back
    val rows = parseInsertRows(out.toByteArray)
    assert(rows == Seq(InsertRow("1:2", Seq("app" -> "web"), 100L,
      Seq("_msg" -> "hi", "level" -> "info"))))
  }

  test("DataBlock golden: const and regular columns") {
    val out = new ByteArrayOutputStream()
    marshalDataBlock(out, Seq("a", "b"),
      Seq(Array("x", "x"), Array("1", "2")), rows = 2)
    // rows=2 cols=2 | "a" const "x" | "b" regular "1" "2"
    assert(hex(out.toByteArray) ==
      "02" + "02" + "0161" + "00" + "0178" + "0162" + "01" + "0131" + "0132")
    val blocks = unmarshalDataBlocks(out.toByteArray)
    assert(blocks == Seq((Seq("a", "b"), Seq(Seq("x", "1"), Seq("x", "2")))))
  }

  test("ValueWithHits golden") {
    val out = new ByteArrayOutputStream()
    marshalValuesWithHits(out, Seq("web" -> 3L))
    assert(hex(out.toByteArray) == "03776562" + "0000000000000003")
    assert(unmarshalValuesWithHits(out.toByteArray) == Seq("web" -> 3L))
  }

  test("varint round-trips across the 1/2/3-byte and big ranges") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, 16383L, 16384L, (1L << 21) - 1,
                  1L << 40, Long.MaxValue)) {
      val out = new ByteArrayOutputStream()
      putVarUint(out, v)
      val r = new Reader(out.toByteArray)
      assert(r.varUint() == v, s"v=$v")
      assert(!r.hasRemaining)
    }
    // reference 2-byte example: 300 = 0xAC 0x02 (binary.Uvarint layout)
    val out = new ByteArrayOutputStream(); putVarUint(out, 300L)
    assert(hex(out.toByteArray) == "ac02")
  }

  test("tenant_ids binary arg round-trips") {
    val b = marshalTenantIds(Seq("1:2", "0:0", "4294967295:7"))
    assert(parseTenantIds(b) == Seq("1:2", "0:0", "4294967295:7"))
    assert(b.length == 24)
  }

  // ------------------------------------------------------------ end-to-end

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/internalproto_test/$name-${System.nanoTime()}"
    Files.createDirectories(Paths.get(d))
    d
  }

  private def get(port: Int, path: String, args: Map[String, String]): (Int, Array[Byte]) = {
    val qs = args.map { case (k, v) =>
      k + "=" + java.net.URLEncoder.encode(v, "ISO-8859-1") }.mkString("&")
    val conn = new URI(s"http://127.0.0.1:$port$path?$qs").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val out = if (is == null) Array.emptyByteArray else is.readAllBytes()
    conn.disconnect()
    (code, out)
  }

  private def commonArgs(q: String, tenants: Seq[String]): Map[String, String] = Map(
    "version" -> "v1",
    // binary tenant ids travel as a latin-1 string, URL-escaped
    "tenant_ids" -> new String(marshalTenantIds(tenants), "ISO-8859-1"),
    "query" -> q,
    "timestamp" -> "1704451200000000000",
    "disable_compression" -> "false")

  /** Split a framed /internal/select/query response into block payloads. */
  private def deframe(body: Array[Byte]): Seq[Array[Byte]] = {
    val r = new Reader(body)
    val out = Seq.newBuilder[Array[Byte]]
    while (r.hasRemaining) {
      val n = r.u64().toInt
      out += java.util.Arrays.copyOfRange(r.src, r.pos, r.pos + n)
      r.pos += n
    }
    out.result()
  }

  test("native insert → native select round-trip with tenant scoping") {
    val dir = tmp("roundtrip")
    val ing = new IngestServer(spark, dir)
    val ingPort = ing.start()
    try {
      // two tenants, two streams, zstd body — like a vlinsert forward
      val body = new ByteArrayOutputStream()
      marshalInsertRow(body, InsertRow("1:2", Seq("app" -> "web"),
        1704451200000000000L, Seq("_msg" -> "hello from web", "level" -> "info")))
      marshalInsertRow(body, InsertRow("1:2", Seq("app" -> "api"),
        1704451260000000000L, Seq("_msg" -> "hello from api")))
      marshalInsertRow(body, InsertRow("0:0", Seq("app" -> "web"),
        1704451200000000000L, Seq("_msg" -> "other tenant row")))
      val compressed = zstdCompress(body.toByteArray)
      val conn = new URI(s"http://127.0.0.1:$ingPort/internal/insert?version=v1")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/octet-stream")
      conn.setRequestProperty("Content-Encoding", "zstd")
      conn.getOutputStream.write(compressed)
      assert(conn.getResponseCode == 200)
      conn.disconnect()

      // wrong protocol version is rejected
      val bad = new URI(s"http://127.0.0.1:$ingPort/internal/insert?version=v0")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      bad.setRequestMethod("POST"); bad.setDoOutput(true)
      bad.getOutputStream.write(Array[Byte]())
      assert(bad.getResponseCode == 400)
      bad.disconnect()

      val qs = new QueryServer(spark, () => LogStore.read(spark, dir), 0)
      val qPort = qs.start()
      try {
        // query: tenant 1:2 sees exactly its two rows, zstd-framed blocks
        val (c0, b0) = get(qPort, "/internal/select/query",
          commonArgs("* | sort by (_time)", Seq("1:2")))
        assert(c0 == 200)
        val rows = deframe(b0).map(zstdDecompress)
          .flatMap(unmarshalDataBlocks).flatMap { case (names, rs) =>
            rs.map(r => names.zip(r).toMap) }
        assert(rows.size == 2)
        assert(rows.map(_("_msg")) == Seq("hello from web", "hello from api"))
        assert(rows.head("level") == "info")
        assert(rows.head("app") == "web")
        assert(rows.forall(r => !r("_msg").contains("other tenant")))

        // disable_compression=true returns raw blocks
        val (c1, b1) = get(qPort, "/internal/select/query",
          commonArgs("\"hello from api\"", Seq("1:2"))
            + ("disable_compression" -> "true"))
        assert(c1 == 200)
        val raw = deframe(b1).flatMap(unmarshalDataBlocks)
        assert(raw.map(_._2.size).sum == 1)

        // field_names: ValueWithHits encoding over the scoped store
        val (c2, b2) = get(qPort, "/internal/select/field_names",
          commonArgs("*", Seq("1:2")))
        assert(c2 == 200)
        val names = unmarshalValuesWithHits(zstdDecompress(b2)).toMap
        assert(names("_msg") == 2L && names("level") == 1L)

        // streams with required limit
        val (c3, b3) = get(qPort, "/internal/select/streams",
          commonArgs("*", Seq("1:2")) + ("limit" -> "10"))
        assert(c3 == 200)
        val streams = unmarshalValuesWithHits(zstdDecompress(b3)).toMap
        assert(streams == Map("{app=\"api\"}" -> 1L, "{app=\"web\"}" -> 1L))

        // stream_field_values
        val (c4, b4) = get(qPort, "/internal/select/stream_field_values",
          commonArgs("*", Seq("1:2")) + ("field" -> "app") + ("limit" -> "10"))
        assert(c4 == 200)
        assert(unmarshalValuesWithHits(zstdDecompress(b4)).toMap ==
          Map("api" -> 1L, "web" -> 1L))

        // an unknown tenant sees nothing, not an error
        val (c5, b5) = get(qPort, "/internal/select/query",
          commonArgs("*", Seq("9:9")))
        assert(c5 == 200 && deframe(b5).map(zstdDecompress)
          .flatMap(unmarshalDataBlocks).map(_._2.size).sum == 0)

        // version mismatch is a client error
        val (c6, _) = get(qPort, "/internal/select/query",
          commonArgs("*", Seq("1:2")) + ("version" -> "v9"))
        assert(c6 >= 400)
      } finally qs.stop()
    } finally ing.stop()
  }
}
