package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interactive LogsQL shell (the reference ships `vlogscli`): point it at a
  * log-store directory (one containing `logs/`) or any parquet path, type
  * LogsQL, get NDJSON rows back.
  *
  * {{{
  *   sbt "runMain graft.Cli /path/to/store"            # REPL
  *   sbt "runMain graft.Cli /path/to/store 'err | stats count()'"  # one-shot
  * }}}
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: graft.Cli <storeDir|parquetPath|http(s)://host:port> [flags] [query]\n" +
        "flags: -datasource.url= -datasource.basicAuth.username= " +
        "-datasource.basicAuth.password= -datasource.bearerToken= " +
        "-datasource.headers='K: V^K2: V2' -accountID= -projectID= " +
        "-datasource.tls.insecureSkipVerify -datasource.tls.caFile=")
      sys.exit(2)
    }
    val (connOpt, positional) = CliHttp.parseArgs(args.toSeq) match {
      case Left(err) => System.err.println(err); sys.exit(2); throw new Exception
      case Right(r) => r
    }
    // remote datasource mode (vlogscli's normal operation): no local
    // Spark at all — queries go to the server's /select/logsql/query
    connOpt.foreach { conn =>
      var mode = "m"
      def runRemote(q: String): Unit =
        try {
          val lines = CliHttp.query(conn, q)
          lines.foreach { l =>
            val m = Option(graft.functions.JsonFlattenExpr.flatten(l))
              .getOrElse(new java.util.LinkedHashMap[String, String]())
            val fields = scala.collection.mutable.ArrayBuffer[(String, String)]()
            m.forEach((k, v) => fields += k -> v)
            val sorted = fields.sortBy(_._1).toSeq
            println(mode match {
              case "m" => CliFormat.fmtJson(sorted, multiline = true)
              case "s" => CliFormat.fmtJson(sorted, multiline = false)
              case "c" => CliFormat.fmtCompact(sorted)
              case "logfmt" => CliFormat.fmtLogfmt(sorted)
            })
          }
          System.err.println(s"-- ${lines.size} row(s)")
        } catch { case e: Exception =>
          System.err.println(s"error: ${e.getMessage}") }
      if (positional.nonEmpty) { mode = "s"; runRemote(positional.mkString(" ")) }
      else {
        System.err.println(s"graft LogsQL shell → ${conn.url} — empty line " +
          """or 'exit' quits; \s \m \c \logfmt switch output mode""")
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(System.in))
        var line = in.readLine()
        while (line != null && line.trim.nonEmpty && line.trim != "exit") {
          line.trim match {
            case """\s""" => mode = "s"
            case """\m""" => mode = "m"
            case """\c""" => mode = "c"
            case """\logfmt""" => mode = "logfmt"
            case q => runRemote(q)
          }
          line = in.readLine()
        }
      }
      return
    }
    if (positional.isEmpty) {
      // flags-only invocation (e.g. `-accountID=0` with no store path or
      // -datasource.url): same usage message as the zero-arg case
      System.err.println(
        "usage: graft.Cli <storeDir|parquetPath|http(s)://host:port> " +
        "[flags] [query]")
      sys.exit(2)
    }
    val path = positional.head
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val source: DataFrame =
      if (new java.io.File(s"$path/logs").isDirectory)
        graft.store.LogStore.read(spark, path)
      else spark.read.parquet(path)

    import CliFormat.{fmtCompact, fmtJson, fmtLogfmt}
    var mode: String = "m" // reference default: multiline JSON

    def run(q: String, limit: Int = 1000): Unit =
      try {
        val out = graft.logql.Compiler.run(source, q)
        val cols = out.columns
        // timestamps render ISO-8601 like the HTTP path's to_json (a
        // plain string cast would print '2024-01-01 10:00:00' — no 'T',
        // no zone, sub-second dropped)
        val strs = out.limit(limit)
          .select(cols.map { c =>
            val cc = col("`" + c + "`")
            out.schema(c).dataType match {
              case org.apache.spark.sql.types.TimestampType |
                   org.apache.spark.sql.types.TimestampNTZType =>
                graft.logql.Render.rfc3339(cc)
              case org.apache.spark.sql.types.DoubleType |
                   org.apache.spark.sql.types.FloatType =>
                graft.logql.Render.goDouble(cc)
              case _ => cc.cast("string")
            }
          }.toSeq: _*)
        val it = strs.toLocalIterator()
        var n = 0
        while (it.hasNext) {
          val r = it.next()
          // the reference prettifier sorts fields by name before every
          // formatter (json_prettifier.go:95-97)
          val fields = cols.indices.collect {
            case i if !r.isNullAt(i) => cols(i) -> r.getString(i)
          }.toSeq.sortBy(_._1)
          println(mode match {
            case "m" => fmtJson(fields, multiline = true)
            case "s" => fmtJson(fields, multiline = false)
            case "c" => fmtCompact(fields)
            case "logfmt" => fmtLogfmt(fields)
          })
          n += 1
        }
        System.err.println(s"-- $n row(s)")
      } catch {
        case e: Exception => System.err.println(s"error: ${e.getMessage}")
      }

    if (positional.length > 1) { mode = "s"; run(positional.drop(1).mkString(" ")) }
    else {
      System.err.println("graft LogsQL shell — empty line or 'exit' quits; " +
        """\s \m \c \logfmt switch output mode""")
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
      var line = in.readLine()
      while (line != null && line.trim.nonEmpty && line.trim != "exit") {
        line.trim match {
          case """\s""" => mode = "s"; System.err.println("singleline json output mode")
          case """\m""" => mode = "m"; System.err.println("multiline json output mode")
          case """\c""" => mode = "c"; System.err.println("compact output mode")
          case """\logfmt""" => mode = "logfmt"; System.err.println("logfmt output mode")
          case q => run(q)
        }
        line = in.readLine()
      }
    }
    spark.stop()
  }
}

/** vlogscli output formatters (app/vlogscli/json_prettifier.go:15-245 and
  * lib/logstorage/rows.go:81-124), reference-exact:
  *
  *   - JSON modes quote through a JSON string marshal with HTML escapes
  *     undone (getJSONString + jsonHTMLReplacer — Jackson never HTML-
  *     escapes, so TextNode matches the post-replace form);
  *   - logfmt keys print RAW (an empty key prints as `_msg`); values
  *     quote iff they contain a char <= 0x20, '"' or '\\' — '=' inside a
  *     VALUE stays raw, and the empty value prints as bare `k=`;
  *   - compact: a lone field prints its value; exactly (_time, other)
  *     prints `time<TAB>other`; anything else falls back to logfmt.
  *
  * Callers pass fields already name-sorted (the prettifier sorts every
  * row before formatting, json_prettifier.go:95-97). */
object CliFormat {
  /** Reference-exact JSON string quoting (quicktemplate
    * AppendJSONString, the writer MarshalFieldsToJSON uses): standard
    * short escapes; `<` and `'` become unicode escapes; remaining
    * control chars are LOWERCASE u00xx (Jackson emits uppercase hex,
    * which is why this is hand-rolled). */
  private[graft] def js(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '<' => sb.append("\\u003c")
      case '\'' => sb.append("\\u0027")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  def fmtJson(fields: Seq[(String, String)], multiline: Boolean): String =
    if (fields.isEmpty) "{}"
    else if (multiline)
      fields.map { case (k, v) => s"  ${js(k)}: ${js(v)}" }
        .mkString("{\n", ",\n", "\n}")
    else fields.map { case (k, v) => s"${js(k)}:${js(v)}" }
      .mkString("{", ",", "}")

  def fmtLogfmt(fields: Seq[(String, String)]): String = {
    def needQuoting(s: String): Boolean =
      s.exists(c => c <= 0x20 || c == '"' || c == '\\')
    fields.map { case (k, v) =>
      val name = if (k.isEmpty) "_msg" else k
      s"$name=${if (needQuoting(v)) js(v) else v}"
    }.mkString(" ")
  }

  def fmtCompact(fields: Seq[(String, String)]): String = fields match {
    case Seq((_, v)) => v // lone field: the value, no name
    case Seq(a, b) if a._1 == "_time" => s"${a._2}\t${b._2}"
    case Seq(a, b) if b._1 == "_time" => s"${b._2}\t${a._2}"
    case fs => fmtLogfmt(fs) // reference falls back to logfmt
  }
}
