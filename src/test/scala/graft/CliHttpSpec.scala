package graft

import org.scalatest.funsuite.AnyFunSuite
import com.sun.net.httpserver.{HttpExchange, HttpServer, HttpsConfigurator, HttpsServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** vlogscli v1.26 datasource auth/TLS flags: every credential flag must
  * reach the wire, and the TLS trust options must gate an https
  * connection exactly (fail closed by default, open with
  * insecureSkipVerify, verify against -datasource.tls.caFile). */
class CliHttpSpec extends AnyFunSuite {

  private def captureServer(): (HttpServer, () => Map[String, String]) = {
    @volatile var seen = Map.empty[String, String]
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/select/logsql/query", (ex: HttpExchange) => {
      import scala.jdk.CollectionConverters._
      seen = ex.getRequestHeaders.asScala.map { case (k, v) =>
        k.toLowerCase -> v.asScala.mkString(",") }.toMap
      ex.getRequestBody.readAllBytes()
      val b = """{"_msg":"ok"}""".getBytes(UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    srv.start()
    (srv, () => seen)
  }

  test("flag parsing: url forms, headers, unknown flag") {
    val Right((Some(c), pos)) = CliHttp.parseArgs(Seq(
      "-datasource.url=http://h:1/", "-accountID=7", "-projectID=9",
      "-datasource.headers=X-One: a^X-Two: b", "level:error"))
    assert(c.url == "http://h:1" && c.accountId.contains("7") &&
      c.projectId.contains("9") &&
      c.headers == Seq("X-One" -> "a", "X-Two" -> "b") &&
      pos == Seq("level:error"))
    // positional URL form
    val Right((Some(c2), pos2)) =
      CliHttp.parseArgs(Seq("https://h:2", "q text"))
    assert(c2.url == "https://h:2" && pos2 == Seq("q text"))
    // local path: no connection
    val Right((none, posL)) = CliHttp.parseArgs(Seq("/some/store", "q"))
    assert(none.isEmpty && posL == Seq("/some/store", "q"))
    assert(CliHttp.parseArgs(Seq("-datasource.bogus=1")).isLeft)
  }

  test("basic auth, bearer token, tenant and custom headers reach the wire") {
    val (srv, seen) = captureServer()
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val basic = CliConn(url, user = Some("alice"), pass = Some("s3cr3t"),
        accountId = Some("12"), projectId = Some("34"),
        headers = Seq("X-Extra" -> "v1"))
      assert(CliHttp.query(basic, "*").nonEmpty)
      val h1 = seen()
      val expTok = java.util.Base64.getEncoder
        .encodeToString("alice:s3cr3t".getBytes(UTF_8))
      assert(h1("authorization") == s"Basic $expTok", h1)
      assert(h1("accountid") == "12" && h1("projectid") == "34", h1)
      assert(h1("x-extra") == "v1", h1)

      val bearer = CliConn(url, bearer = Some("tok123"))
      CliHttp.query(bearer, "*")
      assert(seen()("authorization") == "Bearer tok123", seen())
    } finally srv.stop(0)
  }

  test("TLS: fails closed, opens with insecureSkipVerify, verifies caFile") {
    // self-signed server keypair via the JDK's keytool
    val dir = java.nio.file.Files.createTempDirectory("clitls").toFile
    val ks = new java.io.File(dir, "server.jks").getAbsolutePath
    val cer = new java.io.File(dir, "server.cer").getAbsolutePath
    import scala.sys.process._
    val keytool = s"${sys.props("java.home")}/bin/keytool"
    assert(Seq(keytool, "-genkeypair", "-alias", "srv", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "2", "-keystore", ks,
      "-storepass", "changeit", "-keypass", "changeit",
      "-dname", "CN=127.0.0.1", "-ext", "SAN=IP:127.0.0.1").! == 0)
    assert(Seq(keytool, "-exportcert", "-alias", "srv", "-keystore", ks,
      "-storepass", "changeit", "-file", cer).! == 0)
    val keyStore = java.security.KeyStore.getInstance("JKS")
    val in = new java.io.FileInputStream(ks)
    try keyStore.load(in, "changeit".toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(keyStore, "changeit".toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    val srv = HttpsServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.setHttpsConfigurator(new HttpsConfigurator(ctx))
    srv.createContext("/select/logsql/query", (ex: HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      val b = """{"_msg":"tls ok"}""".getBytes(UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    srv.start()
    try {
      val url = s"https://127.0.0.1:${srv.getAddress.getPort}"
      // default trust: self-signed must be REJECTED
      intercept[Exception] { CliHttp.query(CliConn(url), "*") }
      // -datasource.tls.insecureSkipVerify
      assert(CliHttp.query(CliConn(url, insecureTls = true), "*")
        .exists(_.contains("tls ok")))
      // -datasource.tls.caFile with the exported certificate
      assert(CliHttp.query(CliConn(url, caFile = Some(cer)), "*")
        .exists(_.contains("tls ok")))
    } finally srv.stop(0)
  }
}
