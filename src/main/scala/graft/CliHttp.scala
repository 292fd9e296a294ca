package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

/** vlogscli's datasource connection (app/vlogscli/main.go + v1.26
  * CHANGELOG auth/TLS options): when the CLI is pointed at an http(s)
  * URL instead of a local store path, queries go to
  * `/select/logsql/query` with the configured credentials.
  *
  * Flags (reference names, single-dash):
  *   -datasource.url=U                   query endpoint base URL
  *   -datasource.basicAuth.username=S    HTTP basic auth
  *   -datasource.basicAuth.password=S
  *   -datasource.bearerToken=S           Authorization: Bearer
  *   -datasource.headers='K: V'          extra header (repeatable, ^-sep)
  *   -accountID=N -projectID=N           tenant headers
  *   -datasource.tls.insecureSkipVerify  accept any server certificate
  *   -datasource.tls.caFile=PATH         PEM/DER CA that signs the server
  */
final case class CliConn(
    url: String,
    user: Option[String] = None,
    pass: Option[String] = None,
    bearer: Option[String] = None,
    headers: Seq[(String, String)] = Nil,
    accountId: Option[String] = None,
    projectId: Option[String] = None,
    insecureTls: Boolean = false,
    caFile: Option[String] = None)

object CliHttp {

  /** Split CLI args into (connection config, positional args). Returns
    * Left(error) on an unknown or malformed flag. */
  def parseArgs(args: Seq[String]): Either[String, (Option[CliConn], Seq[String])] = {
    var url: Option[String] = None
    var conn = CliConn("")
    val pos = Seq.newBuilder[String]
    def kv(a: String): (String, String) = {
      val i = a.indexOf('=')
      if (i < 0) (a, "") else (a.take(i), a.drop(i + 1))
    }
    args.foreach { a =>
      if (!a.startsWith("-")) pos += a
      else kv(a) match {
        case ("-datasource.url", v) if v.nonEmpty => url = Some(v)
        case ("-datasource.basicAuth.username", v) => conn = conn.copy(user = Some(v))
        case ("-datasource.basicAuth.password", v) => conn = conn.copy(pass = Some(v))
        case ("-datasource.bearerToken", v) => conn = conn.copy(bearer = Some(v))
        case ("-datasource.headers", v) =>
          // reference format: 'Key1: v1^Key2: v2'
          val hs = v.split('^').toSeq.flatMap { h =>
            val i = h.indexOf(':')
            if (i <= 0) None else Some(h.take(i).trim -> h.drop(i + 1).trim)
          }
          conn = conn.copy(headers = conn.headers ++ hs)
        case ("-accountID", v) => conn = conn.copy(accountId = Some(v))
        case ("-projectID", v) => conn = conn.copy(projectId = Some(v))
        case ("-datasource.tls.insecureSkipVerify", v) =>
          val b =
            if (v.isEmpty) true
            else scala.util.Try(v.toBoolean).getOrElse(
              return Left(s"-datasource.tls.insecureSkipVerify: " +
                s"invalid boolean '$v'"))
          conn = conn.copy(insecureTls = b)
        case ("-datasource.tls.caFile", v) => conn = conn.copy(caFile = Some(v))
        case (k, _) => return Left(s"unknown flag $k")
      }
    }
    if ((conn.user.nonEmpty || conn.pass.nonEmpty) && conn.bearer.nonEmpty)
      return Left("cannot combine -datasource.basicAuth.* with " +
        "-datasource.bearerToken: pick one auth scheme")
    val positional = pos.result()
    val effectiveUrl = url.orElse(
      positional.headOption.filter(p => p.startsWith("http://") || p.startsWith("https://")))
    Right(effectiveUrl match {
      case Some(u) =>
        (Some(conn.copy(url = u.stripSuffix("/"))),
          if (url.isEmpty) positional.drop(1) else positional)
      case None => (None, positional)
    })
  }

  /** Socket factory trusting exactly `caFile`'s certificate(s). */
  private def caTrust(caFile: String): javax.net.ssl.SSLSocketFactory = {
    val cf = java.security.cert.CertificateFactory.getInstance("X.509")
    val in = new java.io.FileInputStream(caFile)
    val certs = try cf.generateCertificates(in) finally in.close()
    val ks = java.security.KeyStore.getInstance(
      java.security.KeyStore.getDefaultType)
    ks.load(null, null)
    val it = certs.iterator()
    var i = 0
    while (it.hasNext) { ks.setCertificateEntry(s"ca$i", it.next()); i += 1 }
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx.getSocketFactory
  }

  private lazy val trustAll: javax.net.ssl.SSLSocketFactory = {
    val tm = new javax.net.ssl.X509TrustManager {
      def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
    }
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, Array(tm), new java.security.SecureRandom())
    ctx.getSocketFactory
  }

  /** Open a connection with every configured credential applied —
    * exposed for the flag tests (they assert on what the server saw). */
  def open(conn: CliConn, pathAndQuery: String): HttpURLConnection = {
    val c = new URI(conn.url + pathAndQuery).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    c match {
      case https: javax.net.ssl.HttpsURLConnection =>
        conn.caFile.foreach(f => https.setSSLSocketFactory(caTrust(f)))
        if (conn.insecureTls) {
          https.setSSLSocketFactory(trustAll)
          https.setHostnameVerifier((_, _) => true)
        }
      case _ => ()
    }
    (conn.user, conn.pass) match {
      case (None, None) => ()
      case (u, p) =>
        val tok = java.util.Base64.getEncoder.encodeToString(
          s"${u.getOrElse("")}:${p.getOrElse("")}".getBytes(UTF_8))
        c.setRequestProperty("Authorization", s"Basic $tok")
    }
    conn.bearer.foreach(t => c.setRequestProperty("Authorization", s"Bearer $t"))
    conn.accountId.foreach(v => c.setRequestProperty("AccountID", v))
    conn.projectId.foreach(v => c.setRequestProperty("ProjectID", v))
    conn.headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
    c
  }

  /** Run one LogsQL query against the remote datasource; returns the raw
    * NDJSON lines. */
  def query(conn: CliConn, q: String, limit: Int = 1000): Seq[String] = {
    val c = open(conn, "/select/logsql/query")
    c.setRequestMethod("POST")
    c.setDoOutput(true)
    c.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
    val body = s"query=${java.net.URLEncoder.encode(q, UTF_8)}&limit=$limit"
    c.getOutputStream.write(body.getBytes(UTF_8))
    val code = c.getResponseCode
    if (code != 200) {
      val err = Option(c.getErrorStream)
        .map(s => new String(s.readAllBytes(), UTF_8)).getOrElse("")
      c.disconnect()
      throw new RuntimeException(s"HTTP $code from ${conn.url}: ${err.take(300)}")
    }
    val out = new String(c.getInputStream.readAllBytes(), UTF_8)
    c.disconnect()
    out.split("\n").toSeq.filter(_.nonEmpty)
  }
}
